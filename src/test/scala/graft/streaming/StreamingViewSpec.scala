package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{CustomerStore, Ingest}

/** The streaming materialized view's transactional sink: redelivered
  * batches are no-ops, state survives checkpointed restarts, and the
  * maintained aggregate equals the batch recompute after every run.
  */
class StreamingViewSpec extends SparkSpec {

  import spark.implicits._

  private def rows(rs: (Long, String, String, String, String)*): DataFrame =
    Ingest.enrich(rs.toDF("id", "first_name", "last_name", "email", "phone"))

  private def viewEqualsTable(store: CustomerStore, stateDir: String): Unit = {
    val mv = StreamingView.read(spark, stateDir)
    val batch = store.all()
      .groupBy(col("uploaded").cast("long").as("uploaded"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
    assert(mv.exceptAll(batch).isEmpty && batch.exceptAll(mv).isEmpty,
      "streaming view diverged from batch recompute")
  }

  test("view tracks the table across two checkpointed runs (restart in between)") {
    val base = tmpDir("smv")
    val store = new CustomerStore(spark, s"$base/store")
    store.insertNew(rows(
      (1L, "Ann", "A", "ann@example.com", "555-1"),
      (2L, "Bob", "B", "bob@example.com", "555-2"),
      (3L, "Cai", "C", "cai@example.com", "555-3"))): Unit
    store.merge(rows((9L, "Ann2", "A", "ann@example.com", "999-1"),
      (4L, "Dee", "D", "dee@example.com", "555-4"))): Unit
    val feedSchema = store.changeFeed().schema
    def drain(): Unit =
      StreamingView.start(spark, s"$base/store/_changelog/*", feedSchema,
        s"$base/state", s"$base/ckpt").awaitTermination()
    drain()
    viewEqualsTable(store, s"$base/state")
    // New commit after the stream stopped; a FRESH query resumes from
    // the checkpoint and applies only the ack delta.
    store.markUploaded(Seq("bob@example.com", "dee@example.com").toDF("email"))
    drain()
    viewEqualsTable(store, s"$base/state")
  }

  test("view absorbs delete retractions: tombstone-only commits keep the aggregate exact") {
    val base = tmpDir("smv-del")
    val store = new CustomerStore(spark, s"$base/store")
    store.insertNew(rows(
      (1L, "Ann", "A", "ann@example.com", "555-1"),
      (2L, "Bob", "B", "bob@example.com", "555-2"),
      (3L, "Cai", "C", "cai@example.com", "555-3"),
      (4L, "Dee", "D", "dee@example.com", "555-4"))): Unit
    val feedSchema = store.changeFeed().schema
    def drain(): Unit =
      StreamingView.start(spark, s"$base/store/_changelog/*", feedSchema,
        s"$base/state", s"$base/ckpt").awaitTermination()
    drain()
    viewEqualsTable(store, s"$base/state")
    // A delete commit carries ONLY delete_pre retractions — the view's
    // standard −1 weighting must absorb it with no delete-aware code.
    assert(store.delete(Seq("bob@example.com", "dee@example.com").toDF("email")) === 2L)
    drain()
    viewEqualsTable(store, s"$base/state")
    // Resurrect one key under a fresh id, ack another, then resume the
    // SAME checkpoint: insert + ack deltas apply on top of the
    // retracted state.
    store.insertNew(rows((14L, "Bob2", "B", "bob@example.com", "555-14"))): Unit
    store.markUploaded(Seq("ann@example.com").toDF("email"))
    drain()
    viewEqualsTable(store, s"$base/state")
  }

  test("parameterized view shape: per id%3 census maintained exactly-once across restart") {
    val base = tmpDir("smv-spec2")
    val spec = StreamingView.ViewSpec(
      Seq("id_mod" -> "CAST(id % 3 AS BIGINT)"),
      Seq("n" -> "CAST(1 AS BIGINT)", "id_sum" -> "id"))
    val store = new CustomerStore(spark, s"$base/store")
    store.insertNew(rows(
      (1L, "Ann", "A", "ann@example.com", "555-1"),
      (2L, "Bob", "B", "bob@example.com", "555-2"),
      (3L, "Cai", "C", "cai@example.com", "555-3"),
      (4L, "Dee", "D", "dee@example.com", "555-4"))): Unit
    val feedSchema = store.changeFeed().schema
    def drain(): Unit =
      StreamingView.start(spark, s"$base/store/_changelog/*", feedSchema,
        s"$base/state", s"$base/ckpt", spec).awaitTermination()
    drain()
    // A merge lands while the stream is down: the resumed query must
    // apply only the delta (update_pre retracts id 2 from its group,
    // the replacement re-adds it, the fresh row joins group 5%3=2).
    store.merge(rows((9L, "Bob2", "B", "bob@example.com", "999-2"),
      (5L, "Eve", "E", "eve@example.com", "555-5"))): Unit
    drain()
    val mv = StreamingView.read(spark, s"$base/state")
    val batch = store.all()
      .groupBy((col("id") % 3).cast("long").as("id_mod"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
    assert(mv.exceptAll(batch).isEmpty && batch.exceptAll(mv).isEmpty,
      "parameterized streaming view diverged from batch recompute")
  }

  test("a fresh checkpoint pointed at an existing state dir fails loudly") {
    val base = tmpDir("smv-pairing")
    val store = new CustomerStore(spark, s"$base/store")
    store.insertNew(rows((1L, "Ann", "A", "ann@example.com", "555-1"))): Unit
    val feedSchema = store.changeFeed().schema
    StreamingView.start(spark, s"$base/store/_changelog/*", feedSchema,
      s"$base/state", s"$base/ckpt").awaitTermination()
    // Retire the checkpoint but keep the state dir: the replacement
    // checkpoint restarts batchIds at 0, so without the pairing guard
    // every delta would silently skip as "already applied".
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(s"$base/ckpt"))
    store.markUploaded(Seq("ann@example.com").toDF("email"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingView.start(spark, s"$base/store/_changelog/*", feedSchema,
        s"$base/state", s"$base/ckpt").awaitTermination()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[IllegalStateException]),
      s"expected the pairing IllegalStateException, got $ex")
  }

  test("redelivered batch is a no-op; an older batchId never regresses state") {
    val base = tmpDir("smv-replay")
    val store = new CustomerStore(spark, s"$base/store")
    store.insertNew(rows(
      (1L, "Ann", "A", "ann@example.com", "555-1"),
      (2L, "Bob", "B", "bob@example.com", "555-2"))): Unit
    val feed = store.changeFeed().localCheckpoint(true)
    StreamingView.applyBatch(s"$base/state")(feed, 0L)
    val after = StreamingView.read(spark, s"$base/state").collect().toSet
    // Crash-redelivery of the same batch, then a stale lower id.
    StreamingView.applyBatch(s"$base/state")(feed, 0L)
    assert(StreamingView.read(spark, s"$base/state").collect().toSet === after,
      "replayed batch double-counted its delta")
    assert(after.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      Set((0L, 2L, 3L)))
  }
}
