package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom functions are callable from SQL via spark.sql.extensions") {
    // Materialize the shared context first, then build a SIBLING session
    // on it with the extensions applied (clearing the default forces a
    // new SparkSession instance; stopping it would kill the shared
    // context, so we only restore the previous default instead).
    val prev = SparkSpec.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions, not .config("spark.sql.extensions", …): when the
    // builder reuses an existing SparkContext, the conf key is only read
    // from that context's conf (set at context creation), so the
    // config-based route silently no-ops here.
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT simhash64('a b c') AS sh,
           fingerprint64('abc') AS fp,
           size(word_shingles('a b c d', 3)) AS nsh,
           size(minhash_bands('a b c d e', 3, 128, 64)) AS nb,
           qdot(array(1L, 2L), array(3L, 4L)) AS dot""").head()
      assert(row.getAs[Long]("sh") === graft.functions.TextKernels.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
      assert(row.getAs[Long]("fp") === graft.functions.TextKernels.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      assert(row.getAs[Int]("nsh") === 2)
      assert(row.getAs[Int]("nb") === 64)
      assert(row.getAs[Long]("dot") === 11L)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
