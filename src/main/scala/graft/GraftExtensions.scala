package graft

import org.apache.spark.sql.SparkSessionExtensions
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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of whitespace tokens"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))
    ext.injectFunction((FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(text) - FNV-1a 64-bit content fingerprint"),
      (children: Seq[Expression]) => Fingerprint64Expr(children.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles"),
      (children: Seq[Expression]) => ShinglesExpr(children.head,
        children(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands", "minhash_bands(text, n, k, bands) - LSH band hashes"),
      (children: Seq[Expression]) => MinHashBandsExpr(children.head,
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Int],
        children(3).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("qdot"),
      info("qdot", "qdot(a, b) - integer dot product of two array<long>"),
      (children: Seq[Expression]) => DotLongExpr(children.head, children(1))))
  }
}
