package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryGroup, Tables}
import graft.util.{DataSkipping, Fs}

/** Data-layout operators: sorted and z-ordered file layouts plus the
  * file-level zone-map skipping they enable ([[graft.util.DataSkipping]]).
  * Each query writes a REAL multi-file layout from the events table,
  * collects per-file min/max stats, runs a range query through the
  * pruned read, and REQUIRES that files were actually skipped before
  * returning — a layout regression (lost sort, broken interleave,
  * stats drift) fails the round even though the aggregate would still
  * be correct. The oracle re-computes the aggregates straight from the
  * events table: zone pruning is may-contain + exact re-filter, so the
  * result must be layout-independent bit-for-bit.
  *
  * All range bounds derive from min/max integer arithmetic (Long
  * division, `//` in DuckDB) so every SF picks its own bounds
  * deterministically on both engines.
  */
object Layout extends QueryGroup {

  // Harness-heavy: the cost is real streams/stores/files, not codegen
  // — warming at sf0.001 pays the fixed harness bill without making
  // the timed pass faster (see QueryGroup.warmup).
  override def warmup: Boolean = false

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100)

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").withColumn("us", expr("ts DIV 1000"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Single-dimension zone skipping: events range-partitioned and
    // sorted by user_id into 16 files; a middle-quintile user range
    // must open strictly fewer files than the layout holds.
    "layout_zone_skipping" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val mm = ev.agg(min(col("user_id")), max(col("user_id"))).head()
      val (mn, mx) = (mm.getLong(0), mm.getLong(1))
      val lo = mn + (mx - mn) * 2 / 5
      val hi = mn + (mx - mn) * 3 / 5
      Fs.withTempDir("graft-zonemap-") { tmp =>
        ev.select(col("user_id"), col("event_id"), col("value"))
          .repartitionByRange(16, col("user_id"))
          .sortWithinPartitions(col("user_id"))
          .write.parquet(s"$tmp/t")
        val (rows, nRead, nTotal) =
          DataSkipping.readRanges(s, s"$tmp/t", Seq(("user_id", lo, hi)))
        require(nRead < nTotal,
          s"zone maps skipped nothing ($nRead of $nTotal files) — sorted layout lost")
        rows.agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).cast("long").as("sum_value_cents"),
          countDistinct(col("user_id")).as("n_users"))
          .localCheckpoint(true) // pin before the temp dir vanishes
      }
    }),

    // BLOOM-FILTER file skipping: the point-lookup complement of the
    // min/max zones. Events are HASH-clustered by user_id into 16
    // files — a layout where every file's [min,max] user zone spans
    // the full range, so zone maps can skip NOTHING for a point
    // predicate — then a 3-user IN lookup consults the per-file bloom
    // index and must open only the files whose filter may contain one
    // of the keys (hash clustering puts each user in exactly one
    // file, so ~3 of 16 plus rare false positives). Lookup keys
    // derive from min/max integer arithmetic, so every SF picks its
    // own keys deterministically on both engines; bloom pruning is
    // may-contain + exact re-filter, so the result is
    // layout-independent bit-for-bit.
    "layout_bloom_skipping" -> ((s, dir) => {
      val ev = events(s, dir)
      val mm = ev.agg(min(col("user_id")), max(col("user_id")),
        countDistinct(col("user_id"))).head()
      val (mn, mx, nKeys) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
      val keys = Seq(1L, 3L, 5L).map(j => mn + (mx - mn) * j / 7)
      // Bloom sizing is data-driven: ~16 bits per distinct key per
      // file (16 files), floor 1024 — an undersized bloom saturates
      // and degrades to read-everything (measured at 10×: 1024 fixed
      // bits at ~940 keys/file skipped 0 of 16 files).
      val bits = math.max(1024L, nKeys / 16 * 16)
      Fs.withTempDir("graft-bloom-") { tmp =>
        ev.select(col("user_id"), col("event_id"), col("value"))
          .repartition(16, col("user_id"))
          .write.parquet(s"$tmp/t")
        val (rows, nRead, nTotal) =
          DataSkipping.readPointLookups(s, s"$tmp/t", "user_id", keys, bits)
        require(nRead < nTotal,
          s"bloom index skipped nothing ($nRead of $nTotal files)")
        rows.agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).cast("long").as("sum_value_cents"),
          countDistinct(col("user_id")).as("n_users"))
          .localCheckpoint(true) // pin before the temp dir vanishes
      }
    }),

    // Bucketed CO-LOCATED join: both sides written bucketed on the
    // join key (8 buckets), so the per-query join shuffle disappears —
    // the scan's bucket partitioning satisfies the SortMergeJoin's
    // distribution requirement on both sides. At 100 TB this is the
    // difference between joining in place and moving the fact table
    // over the network on EVERY run: the shuffle is paid once at write
    // time and amortized across all future joins on that key. The
    // REQUIRE fails the round if either join input re-shuffles (lost
    // bucketing metadata, bucket-count mismatch, planner regression) —
    // only the final 5-group aggregate may exchange. The `merge` hint
    // pins SMJ (the join shape bucketing serves) without mutating the
    // session's broadcast threshold.
    "layout_bucketed_join" -> ((s, dir) => {
      val suffix = java.lang.Long.toHexString(System.nanoTime())
      val (ot, ct) = (s"b_orders_$suffix", s"b_customer_$suffix")
      Fs.withTempDir("graft-bucketed-") { tmp =>
        try {
          Tables(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
            .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .option("path", s"$tmp/$ot").saveAsTable(ot)
          Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment"))
            .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .option("path", s"$tmp/$ct").saveAsTable(ct)
          val joined = s.table(ot).hint("merge")
            .join(s.table(ct), col("o_custkey") === col("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"),
              sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
            .orderBy(col("c_mktsegment"))
          val plan = joined.queryExecution.executedPlan.toString
          require(plan.contains("SortMergeJoin"),
            s"bucketed join did not plan as SMJ:\n$plan")
          require(!plan.contains("Exchange hashpartitioning(o_custkey") &&
            !plan.contains("Exchange hashpartitioning(c_custkey"),
            s"join re-shuffled despite bucketing — co-location lost:\n$plan")
          joined.localCheckpoint(true) // pin before tables/dir vanish
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $ot")
          s.sql(s"DROP TABLE IF EXISTS $ct")
        }
      }
    }),

    // Z-ORDER layout: user bucket (user_id % 8 — populated at every
    // SF; sf0.001 has only 15 users) and hour-of-day bit-interleaved
    // into one key, range-partitioned into 16 files. A rectangle query
    // constrained in BOTH dimensions must skip files — the
    // multi-dimensional pruning a single-column sort cannot give its
    // trailing dimension. The aggregate flows through as a DataFrame
    // (no driver unboxing), so an empty rectangle would surface as the
    // same (0, NULL, 0) row both engines produce.
    "layout_zorder_skipping" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("ub", col("user_id") % 8)
        .withColumn("hr", expr("(us DIV 3600000000) % 24"))
      Fs.withTempDir("graft-zorder-") { tmp =>
        ev.select(col("ub"), col("hr"), col("event_id"), col("value"),
            DataSkipping.zorderKey(col("ub"), col("hr"), 5).as("zkey"))
          .repartitionByRange(16, col("zkey"))
          .sortWithinPartitions(col("zkey"))
          .write.parquet(s"$tmp/t")
        val (rows, nRead, nTotal) = DataSkipping.readRanges(s, s"$tmp/t",
          Seq(("ub", 2L, 5L), ("hr", 6L, 17L)))
        require(nRead < nTotal,
          s"z-order skipped nothing ($nRead of $nTotal files) — interleave lost")
        rows.agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).cast("long").as("sum_value_cents"),
          countDistinct(col("ub")).as("n_buckets"))
          .localCheckpoint(true) // pin before the temp dir vanishes
      }
    }))

  val oracles: Map[String, String] = Map(
    "layout_zone_skipping" ->
      """WITH mm AS (SELECT MIN(user_id) AS mn, MAX(user_id) AS mx FROM events),
          rng AS (SELECT mn + (mx - mn) * 2 // 5 AS lo,
                         mn + (mx - mn) * 3 // 5 AS hi FROM mm)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events
          WHERE user_id >= (SELECT lo FROM rng) AND user_id <= (SELECT hi FROM rng)""",
    "layout_bloom_skipping" ->
      """WITH mm AS (SELECT MIN(user_id) AS mn, MAX(user_id) AS mx FROM events),
          ks AS (SELECT mn + (mx - mn) * j // 7 AS k FROM mm, (VALUES (1), (3), (5)) t(j))
          SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events WHERE user_id IN (SELECT k FROM ks)""",
    "layout_bucketed_join" ->
      """SELECT c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "layout_zorder_skipping" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                CAST(COUNT(DISTINCT user_id % 8) AS BIGINT) AS n_buckets
         FROM events
         WHERE user_id % 8 BETWEEN 2 AND 5
           AND (epoch_us(ts) // 3600000000) % 24 BETWEEN 6 AND 17""")
}
