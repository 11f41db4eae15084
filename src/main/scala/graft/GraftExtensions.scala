package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Exprs._

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text)
  * …")` works for SQL-only users. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  private def checkArity(fn: String, children: Seq[Expression], n: Int): Seq[Expression] = {
    if (children.length != n)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$fn`",
        "expectedNum" -> n.toString,
        "actualNum" -> children.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    children
  }

  /** Integer-literal parameter: fails ANALYSIS with Spark's standard
    * error conditions instead of the obscure eval-time errors a bare
    * `children(i).eval().asInstanceOf[Int]` produced for a column
    * reference, NULL, or non-integer argument. Any integral literal
    * width (TINYINT…BIGINT) is accepted.
    */
  private def litInt(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
    e.eval() match {
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$fn`"))
      case b: Byte => b.toInt
      case s: Short => s.toInt
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case other =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
          "parameter" -> s"`$param`", "functionName" -> s"`$fn`",
          "invalidValue" -> other.toString))
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of whitespace tokens"),
      (children: Seq[Expression]) =>
        SimHash64Expr(checkArity("simhash64", children, 1).head)))
    ext.injectFunction((FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(text) - FNV-1a 64-bit content fingerprint"),
      (children: Seq[Expression]) =>
        Fingerprint64Expr(checkArity("fingerprint64", children, 1).head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (children: Seq[Expression]) => {
        checkArity("word_shingles", children, 2)
        ShinglesExpr(children.head, litInt("word_shingles", "n", children(1)))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(text, n, k, bands) - LSH band hashes"),
      (children: Seq[Expression]) => {
        checkArity("minhash_bands", children, 4)
        MinHashBandsExpr(children.head,
          litInt("minhash_bands", "n", children(1)),
          litInt("minhash_bands", "k", children(2)),
          litInt("minhash_bands", "bands", children(3)))
      }))
    ext.injectFunction((FunctionIdentifier("qdot"),
      info("qdot", "qdot(a, b) - integer dot product of two array<long>"),
      (children: Seq[Expression]) => {
        checkArity("qdot", children, 2)
        DotLongExpr(children.head, children(1))
      }))
    ext.injectFunction((FunctionIdentifier("char_stats"),
      info("char_stats",
        "char_stats(text) - [n_distinct_chars, top_char_count, collision_mass]"),
      (children: Seq[Expression]) =>
        CharStatsExpr(checkArity("char_stats", children, 1).head)))
    // SQL MERGE INTO for graft-store tables: the analyzed MergeIntoTable
    // is rewritten post-hoc into MergeIntoStoreCommand so the statement
    // runs through the store's own commit protocol (see plans.StoreMerge).
    ext.injectPostHocResolutionRule(graft.plans.ResolveStoreMerge)
  }
}
