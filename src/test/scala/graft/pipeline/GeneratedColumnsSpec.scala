package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** GENERATED columns (`addGeneratedColumn` — Delta's GENERATED ALWAYS
  * AS): the store computes the value at write, RECOMPUTES it on merge
  * updates whose batch does not carry it, enforces explicit values via
  * the auto CHECK constraint, never backfills pre-evolution rows, and
  * guards generation inputs against rename/drop.
  */
class GeneratedColumnsSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  // band = id % 7 + ascii(first phone char): '5' = 53, '9' = 57 — the
  // phone prefix makes the generated value INPUT-sensitive, so a merge
  // that changes the phone must visibly recompute it.
  private val GenExpr = "id % 7 + CAST(ascii(substring(phone, 1, 1)) AS BIGINT)"

  private def build(): (CustomerStore, String) = {
    val path = s"${tmpDir("graft-gen-")}/store"
    val st = new CustomerStore(spark, path)
    st.insertNew(Ingest.enrich(rows(1L to 10L))): Unit               // v1
    assert(st.addGeneratedColumn("band", LongType, GenExpr) === 3L)  // v2+v3
    (st, path)
  }

  test("computes on insert, recomputes on merge update, never backfills") {
    val (st, _) = build()
    // Pre-evolution rows read NULL — generation computes at write only.
    assert(st.all().filter(col("band").isNull).count() === 10L)
    // Batch without the column: computed.
    st.insertNew(Ingest.enrich(rows(11L to 15L))): Unit
    val fresh = st.all().filter(col("id") >= 11L && col("id") <= 15L)
    assert(fresh.filter(col("band") === col("id") % 7 + 53L).count() === 5L)
    // Merge updating a pre-evolution row's phone: the update leg must
    // COMPUTE the post-image band (53 → 57) even though the batch does
    // not carry the column and the stored value was NULL.
    val r = st.merge(Ingest.enrich(rows(Seq(2L))
      .withColumn("phone", concat(lit("999-"), col("id")))))
    assert(r.nUpdated === 1L)
    val updated = st.all().filter(col("id") === 2L).head()
    assert(updated.getAs[Long]("band") === 2L % 7 + 57L)
    // Untouched pre-evolution rows stay NULL.
    assert(st.all().filter(col("band").isNull).count() === 9L)
    // Merge insert leg computes too.
    assert(st.merge(Ingest.enrich(rows(Seq(30L)))).nInserted === 1L)
    assert(st.all().filter(col("id") === 30L).head()
      .getAs[Long]("band") === 30L % 7 + 53L)
  }

  test("explicit values answer to the auto constraint; NULL computes") {
    val (st, _) = build()
    // Correct explicit value: admitted.
    st.insertNew(Ingest.enrich(rows(Seq(20L))
      .withColumn("band", col("id") % 7 + 53L))): Unit
    assert(st.all().filter(col("id") === 20L).head()
      .getAs[Long]("band") === 20L % 7 + 53L)
    // Explicit NULL: computed at alignment.
    st.insertNew(Ingest.enrich(rows(Seq(21L))
      .withColumn("band", lit(null).cast(LongType)))): Unit
    assert(st.all().filter(col("id") === 21L).head()
      .getAs[Long]("band") === 21L % 7 + 53L)
    // Wrong explicit value: the WHOLE transaction rejects, untouched.
    val v = st.currentVersion()
    intercept[ConstraintViolationException] {
      st.insertNew(Ingest.enrich(rows(Seq(22L))
        .withColumn("band", lit(999999L)))): Unit
    }
    assert(st.currentVersion() === v)
    assert(st.all().filter(col("id") === 22L).count() === 0L)
  }

  test("SQL UPDATE of a generation input recomputes through the merge path") {
    val (st, path) = build()
    st.insertNew(Ingest.enrich(rows(Seq(40L)))): Unit
    spark.conf.set("spark.sql.catalog.graft_store",
      "graft.sources.GraftStoreCatalog")
    spark.sql(s"UPDATE graft_store.`$path` SET phone = '777-40' WHERE id = 40")
      .collect(): Unit
    assert(st.all().filter(col("id") === 40L).head()
      .getAs[Long]("band") === 40L % 7 + 55L) // ascii('7') = 55
  }

  test("refusal matrix and drop semantics") {
    val (st, _) = build()
    // Unknown reference, generated-on-generated, duplicate name.
    intercept[IllegalArgumentException](
      st.addGeneratedColumn("x", LongType, "nope + 1"))
    intercept[IllegalArgumentException](
      st.addGeneratedColumn("x", LongType, "band + 1"))
    intercept[IllegalArgumentException](
      st.addGeneratedColumn("band", LongType, "id % 3"))
    // Inputs are guarded: rename/drop of phone refused while band lives.
    intercept[IllegalArgumentException](st.renameColumn("phone", "phone2"))
    intercept[IllegalArgumentException](st.dropColumn("phone"))
    // The generated column's type is pinned.
    intercept[IllegalArgumentException](
      st.widenColumn("band", org.apache.spark.sql.types.LongType))
    // Dropping the generated column drops its auto constraint with it;
    // the input is then free.
    st.dropColumn("band"): Unit
    assert(st.checkConstraints().isEmpty)
    st.renameColumn("phone", "phone2"): Unit
  }

  test("feed post-images and the SQL procedure carry computed values") {
    val path = s"${tmpDir("graft-gen-")}/store"
    val st = new CustomerStore(spark, path)
    st.insertNew(Ingest.enrich(rows(1L to 5L))): Unit
    spark.conf.set("spark.sql.catalog.graft_store",
      "graft.sources.GraftStoreCatalog")
    val out = spark.sql(
      s"CALL graft_store.add_generated_column('$path', 'band', 'bigint', '$GenExpr')")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L))
    st.insertNew(Ingest.enrich(rows(Seq(6L)))): Unit
    val feed = st.feedSince(3L, 4L)
    assert(feed.filter(col("change_type") === "insert")
      .head().getAs[Long]("band") === 6L % 7 + 53L)
  }
}
