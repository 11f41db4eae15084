package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MinMaxView: incremental per-group MIN/MAX under the change feed —
  * inserts and interior deletes fold in without touching the table;
  * only a retraction that reaches a stored extremum triggers the
  * per-group re-aggregation fallback (the non-distributive boundary
  * the retraction-weighted MV cannot cross).
  */
class MinMaxViewSpec extends SparkSpec {

  private def batch(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"F$i", s"L$i", s"user$i@example.com", s"555-$i"))
      .toDF("id", "first_name", "last_name", "email", "phone")
  }

  private def emails(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => s"user$i@example.com").toDF("email")
  }

  private val grp = pmod(col("id"), lit(2L))

  private def viewMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("insert-only history folds in with zero recomputes") {
    val store = new CustomerStore(spark, tmpDir("mmv") + "/a")
    store.insertNew(Ingest.enrich(batch(Seq(1L, 2L, 3L, 4L))))
    store.insertNew(Ingest.enrich(batch(Seq(10L, 11L))))
    val (view, recomputes) = MinMaxView.maintain(store, grp)
    assert(recomputes === 0L)
    assert(viewMap(view) === Map(0L -> ((2L, 10L, 3L)), 1L -> ((1L, 11L, 3L))))
  }

  test("interior delete folds in; extremum delete recomputes only its group") {
    val store = new CustomerStore(spark, tmpDir("mmv") + "/b")
    store.insertNew(Ingest.enrich(batch(Seq(1L, 2L, 3L, 4L, 5L, 6L))))
    store.delete(emails(Seq(4L))) // interior of group 0 (2 < 4 < 6)
    val (v1, r1) = MinMaxView.maintain(store, grp)
    assert(r1 === 0L, "interior delete must not re-aggregate")
    assert(viewMap(v1) === Map(0L -> ((2L, 6L, 2L)), 1L -> ((1L, 5L, 3L))))
    store.delete(emails(Seq(1L))) // minimum of group 1
    val (v2, r2) = MinMaxView.maintain(store, grp)
    assert(r2 === 1L, "extremum delete must re-aggregate exactly its group")
    assert(viewMap(v2) === Map(0L -> ((2L, 6L, 2L)), 1L -> ((3L, 5L, 2L))))
  }

  test("deleting a group's last rows removes the group from the view") {
    val store = new CustomerStore(spark, tmpDir("mmv") + "/c")
    store.insertNew(Ingest.enrich(batch(Seq(1L, 2L, 3L))))
    store.delete(emails(Seq(1L, 3L))) // group 1 emptied
    val (view, _) = MinMaxView.maintain(store, grp)
    assert(viewMap(view) === Map(0L -> ((2L, 2L, 1L))))
  }

  test("merge updates (retraction + insert pairs) stay consistent") {
    val store = new CustomerStore(spark, tmpDir("mmv") + "/d")
    store.insertNew(Ingest.enrich(batch(Seq(1L, 2L, 3L, 4L))))
    // Same emails, phone change only: update_pre/update pairs with the
    // SAME id — the retraction hits an extremum for ids 1 and 4.
    store.merge(Ingest.enrich(batch(Seq(1L, 4L))
      .withColumn("phone", lit("555-new"))))
    val (view, _) = MinMaxView.maintain(store, grp)
    val batchView = store.all().select(grp.as("g"), col("id"))
      .groupBy(col("g")).agg(min(col("id")).as("mn"),
        max(col("id")).as("mx"), count(lit(1)).as("n"))
    assert(view.exceptAll(batchView).isEmpty && batchView.exceptAll(view).isEmpty)
  }
}
