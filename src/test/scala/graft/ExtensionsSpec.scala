package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  /** Materialize the shared context first, then build a SIBLING session
    * on it with the extensions applied (clearing the default forces a
    * new SparkSession instance; stopping it would kill the shared
    * context, so we only restore the previous default instead).
    * withExtensions, not .config("spark.sql.extensions", …): when the
    * builder reuses an existing SparkContext, the conf key is only read
    * from that context's conf (set at context creation), so the
    * config-based route silently no-ops here.
    */
  private def withExtSession(body: SparkSession => Unit): Unit = {
    val prev = SparkSpec.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try body(spark)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("custom functions are callable from SQL via spark.sql.extensions") {
    withExtSession { spark =>
      val row = spark.sql(
        """SELECT simhash64('a b c') AS sh,
           fingerprint64('abc') AS fp,
           size(word_shingles('a b c d', 3)) AS nsh,
           size(minhash_bands('a b c d e', 3, 128, 64)) AS nb,
           qdot(array(1L, 2L), array(3L, 4L)) AS dot,
           char_stats('aab') AS cs""").head()
      assert(row.getAs[Long]("sh") === graft.functions.TextKernels.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
      assert(row.getAs[Long]("fp") === graft.functions.TextKernels.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      assert(row.getAs[Int]("nsh") === 2)
      assert(row.getAs[Int]("nb") === 64)
      assert(row.getAs[Long]("dot") === 11L)
      // 'aab': 2 distinct chars, top count 2, collision mass 2² + 1² = 5
      assert(row.getAs[Seq[Long]]("cs") === Seq(2L, 2L, 5L))
    }
  }

  test("a SQL-only user can run the full MinHash-LSH dedup pipeline") {
    // The whole sketch → band-join → exact-verify operator written in
    // nothing but SQL over the registered functions, checked against
    // the DataFrame inventory query row for row.
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    withExtSession { spark =>
      spark.read.parquet(s"$sf/documents.parquet")
        .createOrReplaceTempView("documents")
      val sqlOnly = spark.sql(
        """WITH ex AS (
             SELECT doc_id, band, bh FROM documents
             LATERAL VIEW posexplode(minhash_bands(text, 3, 128, 64)) t AS band, bh),
           cand AS (
             SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM ex x JOIN ex y
               ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
           sh AS (
             SELECT doc_id, word_shingles(text, 3) AS shingles,
                    CAST(size(word_shingles(text, 3)) AS BIGINT) AS n
             FROM documents),
           v AS (
             SELECT doc_a, doc_b,
               CAST(size(array_intersect(a.shingles, b.shingles)) AS BIGINT) AS common,
               a.n AS na, b.n AS nb
             FROM cand JOIN sh a ON cand.doc_a = a.doc_id
                       JOIN sh b ON cand.doc_b = b.doc_id)
           SELECT doc_a, doc_b,
             CAST(floor(CAST(common AS DOUBLE) * 1000000.0 / (na + nb - common)) AS BIGINT) AS jaccard_ppm
           FROM v
           WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5
           ORDER BY doc_a, doc_b""").collect()
      val dataframe = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      assert(sqlOnly.nonEmpty, "no near-dup pairs at this SF — test vacuous")
      assert(sqlOnly.map(_.toSeq).toSeq === dataframe.map(_.toSeq).toSeq)
    }
  }

  test("non-literal / invalid integer parameters fail analysis with a clean message") {
    withExtSession { spark =>
      import org.apache.spark.sql.AnalysisException
      spark.range(1).selectExpr("CAST(id AS INT) AS n", "'a b c' AS text")
        .createOrReplaceTempView("t")
      // Column reference where a literal is required → NON_FOLDABLE_ARGUMENT,
      // not the former obscure eval-time failure.
      val nonFoldable = intercept[AnalysisException] {
        spark.sql("SELECT word_shingles(text, n) FROM t").collect()
      }
      assert(nonFoldable.getCondition === "NON_FOLDABLE_ARGUMENT")
      assert(nonFoldable.getMessage.contains("word_shingles"))
      // NULL literal → INVALID_PARAMETER_VALUE.NULL.
      val nullArg = intercept[AnalysisException] {
        spark.sql("SELECT minhash_bands(text, 3, NULL, 64) FROM t").collect()
      }
      assert(nullArg.getCondition === "INVALID_PARAMETER_VALUE.NULL")
      // Non-integer literal → INVALID_PARAMETER_VALUE.INTEGER.
      val nonInt = intercept[AnalysisException] {
        spark.sql("SELECT word_shingles(text, 'three') FROM t").collect()
      }
      assert(nonInt.getCondition === "INVALID_PARAMETER_VALUE.INTEGER")
      // Wrong arity → WRONG_NUM_ARGS.
      val arity = intercept[AnalysisException] {
        spark.sql("SELECT simhash64(text, 1) FROM t").collect()
      }
      assert(arity.getCondition === "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    }
  }
}
