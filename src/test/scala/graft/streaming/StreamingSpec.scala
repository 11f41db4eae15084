package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.pipeline.{CustomerStore, JdbcCustomerStore}

class StreamingSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)

  test("streaming ingest picks up files incrementally and checkpoint makes reruns idempotent") {
    val in = tmpDir("stream-in")
    val ckpt = tmpDir("stream-ckpt")
    val store = new CustomerStore(spark, tmpDir("stream-store") + "/customers")
    writeFile(in, "a.csv", Seq(
      "1,Ann,A,ann@example.com,1",
      "2,Bob,B,bob@example.com,2"))
    StreamingIngest.start(spark, in, store, ckpt, header = false)
      .awaitTermination()
    assert(store.pending().count() === 2)
    // Second file + a rerun: checkpoint skips a.csv, dedup would catch a
    // replay anyway.
    writeFile(in, "b.csv", Seq(
      "3,Cai,C,cai@example.com,3",
      "1,Dup,D,ann2@example.com,4", // dup id vs stored → dropped
      "bad,Eli,E,eli@example.com,5")) // bad id → quarantined
    StreamingIngest.start(spark, in, store, ckpt, header = false)
      .awaitTermination()
    assert(store.pending().count() === 3)
    assert(store.all().count() === 3)
  }

  test("streaming ingest lands micro-batches in the JDBC store (CSV -> DB, the reference's shape)") {
    val in = tmpDir("stream-in")
    val ckpt = tmpDir("stream-ckpt")
    val store = new JdbcCustomerStore(spark,
      s"jdbc:derby:${tmpDir("streamdb")}/cust;create=true")
    writeFile(in, "a.csv", Seq(
      "1,Ann,A,ann@example.com,1",
      "2,Bob,B,bob@example.com,2"))
    writeFile(in, "b.csv", Seq(
      "3,Cai,C,cai@example.com,3",
      "2,Dup,D,bob2@example.com,4")) // dup id across files → dropped
    StreamingIngest.start(spark, in, store, ckpt, header = false)
      .awaitTermination()
    assert(store.pending().count() === 3)
    assert(store.all().count() === 3)
  }

  test("watermarked hourly counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = EventStreams.hourlyCounts(df).writeStream
      .format("memory").queryName("hourly").outputMode(OutputMode.Append())
      .start()
    val h0 = Timestamp.valueOf("2024-01-01 10:05:00")
    val h1 = Timestamp.valueOf("2024-01-01 11:10:00")
    val late = Timestamp.valueOf("2024-01-01 14:00:00") // advances watermark past 10:00+2h
    mem.addData((h0, "click"), (h0, "click"), (h1, "view"), (late, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hourly").collect()
    // The 10:00 window (watermark 14:00-2h=12:00 > 11:00 close) must be
    // finalized and emitted in append mode.
    assert(rows.exists(r => r.getAs[String]("event_type") == "click" && r.getAs[Long]("n") == 2))
  }

  test("streaming exact dedup on the custom fingerprint expression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("text")
      .withColumn("fp", graft.functions.Exprs.fingerprint64(
        org.apache.spark.sql.functions.col("text")))
      .dropDuplicates("fp")
      .writeStream.format("memory").queryName("fp_dedup")
      .outputMode(OutputMode.Append())
      .start()
    mem.addData("alpha doc", "beta doc")
    q.processAllAvailable()
    mem.addData("alpha doc", "gamma doc") // exact dup arrives later
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("fp_dedup").select("text")
      .collect().map(_.getString(0)).sorted
    assert(texts === Array("alpha doc", "beta doc", "gamma doc"))
  }

  test("streaming dropDuplicates suppresses redelivered keys across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "payload")
      .dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append())
      .start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((2L, "b-again"), (3L, "c")) // cross-batch redelivery
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState emits completed sessions on gap split and event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.completedSessions(mem.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    def ev(uid: Long, t: String) =
      EventStreams.UserEvent(uid, Timestamp.valueOf(t), "click", 1.0)
    // User 7: two events 5 min apart, then one 55 min later — the gap
    // closes the first session inside the batch (flatMap: one output,
    // one still-open session from a single invocation).
    mem.addData(ev(7, "2024-01-01 10:00:00"), ev(7, "2024-01-01 10:05:00"),
      ev(7, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    // Watermark semantics: even the gap-closed first session is held
    // until the watermark passes its end + gap — nothing may emit yet
    // (a within-watermark straggler could still extend it).
    assert(spark.table("sessions").collect().isEmpty)
    // A within-watermark LATE event just before the open session's
    // start must merge and extend the start backwards (symmetric gap
    // rule), not inflate the count at the wrong boundary.
    mem.addData(ev(7, "2024-01-01 10:45:00"))
    q.processAllAvailable()
    // Another user's events advance the watermark past 11:00 + gap; the
    // open session must finalize via the event-time timeout with no
    // further user-7 input (the state-reclaim contract).
    mem.addData(ev(9, "2024-01-01 15:00:00"))
    q.processAllAvailable()
    mem.addData(ev(9, "2024-01-01 15:01:00"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sessions").collect()
    val u7 = all.filter(_.getAs[Long]("user_id") == 7L)
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(u7.length === 2, s"open session not finalized by timeout: ${all.toSeq}")
    assert(u7 === Seq(("2024-01-01 10:00:00.0", 2L), ("2024-01-01 10:45:00.0", 2L)),
      s"late merge must extend the session start: ${u7.toSeq}")
  }

  test("late events within one gap of each other merge into one late session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.completedSessions(mem.toDS()).writeStream
      .format("memory").queryName("late_sessions").outputMode(OutputMode.Append())
      .start()
    def ev(uid: Long, t: String) =
      EventStreams.UserEvent(uid, Timestamp.valueOf(t), "click", 1.0)
    // Open a session at 12:00 (watermark lands at 10:00, 2h behind).
    mem.addData(ev(4, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    // Two within-watermark late events, 10 min apart, both more than a
    // gap before the open session: they must merge into ONE late session
    // (10:30-10:40, n=2), not two singletons.
    mem.addData(ev(4, "2024-01-01 10:30:00"), ev(4, "2024-01-01 10:40:00"))
    q.processAllAvailable()
    // Advance the watermark past both sessions' end + gap to flush them.
    mem.addData(ev(9, "2024-01-01 16:00:00"))
    q.processAllAvailable()
    mem.addData(ev(9, "2024-01-01 16:01:00"))
    q.processAllAvailable()
    q.stop()
    val u4 = spark.table("late_sessions").collect()
      .filter(_.getAs[Long]("user_id") == 4L)
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(u4.toSeq === Seq(
      ("2024-01-01 10:30:00.0", "2024-01-01 10:40:00.0", 2L),
      ("2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)),
      s"late events within one gap must merge into one session: ${u4.toSeq}")
  }

  test("a gap straddling the session boundary within one millisecond splits (µs precision)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.completedSessions(mem.toDS()).writeStream
      .format("memory").queryName("straddle").outputMode(OutputMode.Append())
      .start()
    def ev(uid: Long, t: String) =
      EventStreams.UserEvent(uid, Timestamp.valueOf(t), "click", 1.0)
    // Gap = 30 min + 500 µs: over the gap in µs, but exactly 30 min
    // after ms-flooring both ends — an operator sessionizing on
    // Timestamp.getTime would merge the pair; the batch twin (µs
    // arithmetic) splits it. Parity requires the split.
    mem.addData(ev(5, "2024-01-01 10:00:00"),
      ev(5, "2024-01-01 10:30:00.0005"))
    q.processAllAvailable()
    // Advance the watermark past both sessions' end + gap.
    mem.addData(ev(9, "2024-01-01 16:00:00"))
    q.processAllAvailable()
    mem.addData(ev(9, "2024-01-01 16:01:00"))
    q.processAllAvailable()
    q.stop()
    val u5 = spark.table("straddle").collect()
      .filter(_.getAs[Long]("user_id") == 5L)
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(u5.toSeq === Seq(("2024-01-01 10:00:00.0", 1L),
      ("2024-01-01 10:30:00.0005", 1L)),
      s"straddle pair must split at µs precision: ${u5.toSeq}")
  }

  test("stream-stream interval join pairs purchases with preceding views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp)]
    val df = mem.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val q = EventStreams.viewsBeforePurchases(df).writeStream
      .format("memory").queryName("vbp").outputMode(OutputMode.Append())
      .start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (1L, 100L, "view", t("2024-01-01 09:00:00")),     // > 1h before → excluded
      (1L, 101L, "view", t("2024-01-01 10:00:00")),     // in window
      (1L, 102L, "view", t("2024-01-01 10:30:00")),     // == purchase ts → excluded (strict <)
      (2L, 103L, "view", t("2024-01-01 10:15:00")),     // other user → excluded
      (1L, 200L, "purchase", t("2024-01-01 10:30:00")),
      (1L, 104L, "click", t("2024-01-01 10:20:00")))    // wrong type → excluded
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("vbp")
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq === Seq((200L, 101L)),
      s"only the in-window strictly-earlier same-user view must match: ${rows.toSeq}")
  }

  test("corpus curation filters (tokens, langid, quality) run in a stream") {
    // The text operators are stateless projections over custom
    // expressions — this pins that they are streaming-safe, i.e. the
    // curation pass can run as documents arrive instead of batch-only.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val toks = tokens(col("text"))
    val q = mem.toDF().toDF("text")
      .select(col("text"), size(toks).cast("long").as("n_tokens"),
        langId(toks).as("lang_pred"))
      .filter(col("n_tokens") >= 5 && col("lang_pred") =!= "und")
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append())
      .start()
    mem.addData(
      "the cat and the hat is very happy today",        // en, long enough
      "zzz qqq xxx yyy www vvv",                        // und → dropped
      "der hund und das haus ist hier heute",           // de, kept
      "the end")                                        // too short → dropped
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("curated").select("lang_pred")
      .collect().map(_.getString(0)).sorted
    assert(kept === Array("de", "en"))
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningUserTotals(mem.toDS()).writeStream
      .format("memory").queryName("running").outputMode(OutputMode.Update())
      .start()
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(EventStreams.UserEvent(7, t, "click", 1.5))
    q.processAllAvailable()
    mem.addData(EventStreams.UserEvent(7, t, "view", 2.5))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running").collect()
      .filter(_.getAs[Long]("user_id") == 7)
      .maxBy(_.getAs[Long]("n_events"))
    assert(last.getAs[Long]("n_events") === 2)
    assert(last.getAs[Double]("total_value") === 4.0)
  }
}
