package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Custom Catalyst expressions for the sketching operators Spark lacks.
  * Each is a thin wrapper over a [[TextKernels]] one-pass kernel; the
  * generated code is a single static call, so the expression lives
  * inside whole-stage codegen spans instead of falling back to
  * interpreted evaluation (see TextKernels scaladoc for why HOF
  * compositions were rejected).
  */
object Exprs {

  /** MinHash signature + LSH band hashes over word n-gram shingles. */
  case class MinHashBandsExpr(child: Expression, n: Int, k: Int, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_bands"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.minhashBands(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashBands($c, $n, $k, $bands)")
    override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a document's whitespace tokens. */
  case class SimHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.simhash64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
      copy(child = newChild)
  }

  /** FNV-1a 64-bit rolling-hash fingerprint of the raw text bytes. */
  case class Fingerprint64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "fingerprint64"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.fingerprint64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.fingerprint64($c)")
    override protected def withNewChildInternal(newChild: Expression): Fingerprint64Expr =
      copy(child = newChild)
  }

  /** Char-diversity stats [n_distinct, top_count, Σc²], one pass. */
  case class CharStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "char_stats"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.charStats(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charStats($c)")
    override protected def withNewChildInternal(newChild: Expression): CharStatsExpr =
      copy(child = newChild)
  }

  /** Distinct word n-gram shingles (array<string>), one pass. */
  case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override protected def nullSafeEval(input: Any): Any =
      TextKernels.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
      copy(child = newChild)
  }

  /** Integer dot product of two array<long> vectors. The zip_with +
    * aggregate HOF composition evaluates interpreted (outside codegen)
    * and allocates per pair — ~70µs/pair observed, which at 12.5M
    * candidate pairs (sf0.1) is minutes; this kernel is ~100ns.
    */
  case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "qdot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.dotLong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dotLong($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLongExpr =
      copy(left = newLeft, right = newRight)
  }

  // Column-level entry points.
  def minhashBands(text: Column, n: Int = 3, k: Int = 128, bands: Int = 64): Column =
    ExpressionUtils.column(MinHashBandsExpr(ExpressionUtils.expression(text), n, k, bands))

  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(text)))

  def fingerprint64(text: Column): Column =
    ExpressionUtils.column(Fingerprint64Expr(ExpressionUtils.expression(text)))

  def shingles(text: Column, n: Int = 3): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(text), n))

  def charStats(text: Column): Column =
    ExpressionUtils.column(CharStatsExpr(ExpressionUtils.expression(text)))

  def dotLong(a: Column, b: Column): Column =
    ExpressionUtils.column(DotLongExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
