package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryGroup, Tables}

/** Batch analytics over the `events` stream table: tumbling windows,
  * sessionization, as-of joins, and semi-structured (JSON) extraction.
  * The same transforms run as Structured Streaming in
  * [[graft.streaming.EventStreams]]; here they are expressed in batch
  * form so the DuckDB oracle can check them.
  *
  * Timestamps are compared at microsecond precision (`unix_micros` /
  * `epoch_us`) — the parquet files store nanos, Spark truncates to
  * micros on read and DuckDB's epoch_us truncates identically, so the
  * integers hash-match. Double `value` sums are floored to integer cents
  * per row (IEEE multiply + floor is bit-identical in both engines;
  * long sums are exact and order-independent).
  */
object Events extends QueryGroup {

  private def cents(c: Column): Column = floor(c * 100)
  private val SESSION_GAP_US = 1800L * 1000000 // 30 min
  // Windowed-funnel conversion deadline (6h): chosen so every SF shows
  // real drop-off at both constrained stages (measured 15/14/1,
  // 150/118/18, 1500/1081/195 across sf0.001/0.01/0.1).
  private[queries] val FUNNEL_W_US = 6L * 3600 * 1000000
  // Attribution lookback (1h): short enough that all three channels
  // (click / view / direct) are populated at every SF.
  private[queries] val ATTR_W_US = 3600L * 1000000

  /** events with `ts` (nanos-as-long, see Tables) converted to exact
    * microseconds via integer division — the nano value (~1.7e18)
    * exceeds double's 2^53 mantissa, so float division would corrupt it.
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").withColumn("us", expr("ts DIV 1000"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour windows per event type: the batch form of the
    // streaming groupBy(window($"ts", "1 hour"), $"event_type").
    "events_hourly" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", timestamp_micros(col("us"))).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_value_cents"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Sessionization: 30-minute-gap sessions per user via the classic
    // lag → gap flag → running sum pattern. One shuffle on user_id; both
    // windows share the same partitioning so Catalyst plans one exchange.
    "events_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("us"))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(byUser) > SESSION_GAP_US || lag(col("us"), 1).over(byUser).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long").as("duration_sec"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // As-of join: for each purchase, the user's most recent strictly
    // earlier view. Implemented as union + last(ignoreNulls) over one
    // user-partitioned window — a single shuffle, no range join, which is
    // exactly how you'd do it at 100 TB (a point-in-time lookup join).
    "events_asof_view_before_purchase" -> ((s, dir) => {
      val e = events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("us"),
          (col("event_type") === "view").cast("int").as("is_view"))
      // Views sort after purchases at equal timestamps → "strictly
      // earlier" semantics for the running last().
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("is_view"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_view_id",
          last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_view_us",
          last(when(col("is_view") === 1, col("us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
          col("last_view_id"), col("last_view_us"))
        .orderBy(col("event_id"))
    }),

    // Conversion funnel view → click → purchase: per user, the first
    // view, the first click strictly after it, the first purchase
    // strictly after that; one output row per stage with the surviving
    // user count. All three stages aggregate and join on user_id — the
    // same shuffle key throughout, so at scale the exchanges co-locate
    // and each stage carries only (user_id, first_ts) pairs, never the
    // event stream itself.
    "events_funnel" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"), col("us"))
      def firstAfter(typ: String, prev: DataFrame, prevTs: String, outTs: String): DataFrame =
        e.filter(col("event_type") === typ)
          .join(prev, "user_id")
          .filter(col("us") > col(prevTs))
          .groupBy(col("user_id")).agg(min(col("us")).as(outTs))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
      val c = firstAfter("click", v, "v_us", "c_us")
      val p = firstAfter("purchase", c, "c_us", "p_us")
      def stage(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      stage("1_view", v).unionByName(stage("2_click", c))
        .unionByName(stage("3_purchase", p))
        .orderBy(col("stage"))
    }),

    // LAST-TOUCH REVENUE ATTRIBUTION (the marketing-analytics dual of
    // the windowed funnel — nearest PRECEDING touch instead of next
    // following conversion): each purchase's floor-cents value is
    // attributed to the most recent click within 1h, else the most
    // recent view within 1h, else 'direct'. Two stacked running-MAX
    // windows over one (user, stream-order) sort give every event its
    // last-click and last-view timestamps — join-free, one user_id
    // exchange, linear in events; the rollup is a 3-row channel
    // census in exact integer cents.
    "events_attribution" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("us"), col("value"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("last_c",
          max(when(col("event_type") === "click", col("us"))).over(wPrev))
        .withColumn("last_v",
          max(when(col("event_type") === "view", col("us"))).over(wPrev))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("last_c").isNotNull &&
            col("us") - col("last_c") <= ATTR_W_US, "click")
          .when(col("last_v").isNotNull &&
            col("us") - col("last_v") <= ATTR_W_US, "view")
          .otherwise("direct"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(cents(col("value"))).cast("long").as("revenue_cents"))
        .orderBy(col("channel"))
    }),

    // CEP-STYLE PATTERN WITH NEGATION — the MATCH_RECOGNIZE shape
    // ("A then B with NO C between") that neither the funnel
    // (existence within a window) nor attribution (nearest preceding
    // touch) expresses: a view converts DIRECTLY iff the user's next
    // purchase after it has no click strictly between the two events.
    // Join-free: one (user, stream-order) sort carries a running click
    // count plus two following-window mins over purchase rows — next
    // purchase timestamp and next purchase's click-prefix (the SAME
    // row's, because the prefix is nondecreasing in stream order, so
    // the min over following purchases is the first one's) — and the
    // negation collapses to one integer equality of prefixes, never a
    // per-pair interval scan. One user_id exchange, linear in events;
    // hot users cost their event count, not its square.
    "events_pattern_negation" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("us"))
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val wFollow = wOrd.rowsBetween(1, Window.unboundedFollowing)
      val marked = e
        .withColumn("cum_clicks",
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_p_us",
          min(when(col("event_type") === "purchase", col("us"))).over(wFollow))
        .withColumn("next_p_cum",
          min(when(col("event_type") === "purchase", col("cum_clicks"))).over(wFollow))
      marked.filter(col("event_type") === "view")
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("next_p_us").isNull, 1L).otherwise(0L)).as("n_no_purchase"),
          sum(when(col("next_p_us").isNotNull &&
            col("next_p_cum") === col("cum_clicks"), 1L).otherwise(0L)).as("n_direct"),
          sum(when(col("next_p_us").isNotNull &&
            col("next_p_cum") =!= col("cum_clicks"), 1L).otherwise(0L)).as("n_intervened"),
          coalesce(sum(when(col("next_p_us").isNotNull &&
            col("next_p_cum") === col("cum_clicks"),
            col("next_p_us") - col("us"))), lit(0L)).as("direct_gap_us_sum"))
    }),

    // CHANGE-POINT DETECTION over the hourly event series — the CUSUM
    // statistic kept EXACTLY integer: with prefix_t = Σ_{i≤t} x_i the
    // centered cumulative sum is S_t = prefix_t − t·mean, which scaled
    // by n becomes S'_t = n·prefix_t − t·total (no rational mean, no
    // floats); the change point is the interior argmax of |S'_t| (ties
    // by hour). Level-shift means on either side are reported as exact
    // floor-ppm ratios. The corpus-scale work is ONE hourly count
    // aggregate (us DIV 3600000000 — integer bucketing, no date
    // functions); the CUSUM scan runs on the hours table, which is
    // bounded by the time range whatever the event volume — the same
    // aggregate-then-analyze shape as graph_nation_rank.
    "events_changepoint" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(expr("us DIV 3600000000").as("hour"))
        .agg(count(lit(1)).as("x"))
      val wOrd = Window.orderBy(col("hour"))
      val seq = hourly
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("prefix", sum(col("x")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = seq.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
      seq.crossJoin(tot)
        .filter(col("t") < col("n")) // interior points only
        .withColumn("cusum_stat",
          abs(col("n") * col("prefix") - col("t") * col("total")))
        .orderBy(col("cusum_stat").desc, col("hour"))
        .limit(1)
        .select(col("hour").as("cp_hour"), col("t").as("cp_index"),
          col("n").as("n_hours"), col("total").as("total_events"),
          col("cusum_stat"),
          expr("prefix * 1000000 DIV t").as("mean_before_ppm"),
          expr("(total - prefix) * 1000000 DIV (n - t)").as("mean_after_ppm"))
    }),

    // TIME-CONSTRAINED funnel (the Amplitude-style conversion window):
    // view → click within 6h → purchase within 6h OF THAT CLICK. The
    // unconstrained funnel above is greedy-from-first-view; with a
    // deadline that greedy walk is WRONG (a user whose first view
    // never converts can still qualify via a later view), so this
    // matches ANY qualifying sequence — without the quadratic
    // view×click per-user join: three stacked running-min window
    // functions over one (user, stream-order) sort give every event
    // its next-purchase, next-click, and next-CONVERTING-click
    // timestamps, and a view qualifies iff the relevant next-ts lands
    // inside the window. One user_id exchange, O(n log n) per user —
    // hot users cost their event count, never its square. Stream
    // order is the (us, event_id) total order, mirrored in the
    // oracle's window frames.
    "events_funnel_windowed" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val x = e.withColumn("next_p",
        min(when(col("event_type") === "purchase", col("us"))).over(wNext))
      val y = x
        .withColumn("next_c",
          min(when(col("event_type") === "click", col("us"))).over(wNext))
        .withColumn("next_cc",
          min(when(col("event_type") === "click" && col("next_p").isNotNull &&
              col("next_p") - col("us") <= FUNNEL_W_US, col("us"))).over(wNext))
      // ONE pass over the annotated views: the three stage cardinalities
      // are conditional countDistincts in a single aggregate (shared
      // scan + windows + shuffle), unpivoted to rows via stack.
      y.filter(col("event_type") === "view")
        .agg(
          countDistinct(col("user_id")).as("s1"),
          countDistinct(when(col("next_c").isNotNull &&
            col("next_c") - col("us") <= FUNNEL_W_US, col("user_id"))).as("s2"),
          countDistinct(when(col("next_cc").isNotNull &&
            col("next_cc") - col("us") <= FUNNEL_W_US, col("user_id"))).as("s3"))
        .selectExpr(
          "stack(3, '1_view', s1, '2_click_6h', s2, '3_purchase_6h', s3) AS (stage, n_users)")
        .orderBy(col("stage"))
    }),

    // Cohort retention: cohort = the user's first active day, cell =
    // distinct users from that cohort active again `day_offset` days
    // later. Day arithmetic stays in integer microseconds (us DIV
    // 86_400_000_000) so both engines bucket identically — no date/
    // timezone functions involved. Two shuffles, both on user_id.
    "events_retention" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), expr("us DIV 86400000000").as("day"))
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Session path mining: the first three event types of each
    // 30-minute-gap session, concatenated into a path string, with the
    // top-10 paths by session count — the classic behavioral "what do
    // sessions start with" query. Reuses the sessionize machinery
    // (lag → gap → running sum); the per-session pivot uses
    // max(CASE rn) rather than an ordered collect so no engine-specific
    // array ordering is involved.
    "events_paths" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(byUser) > SESSION_GAP_US || lag(col("us"), 1).over(byUser).isNull, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(cum))
      val bySess = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("us"), col("event_id"))
      sess.withColumn("rn", row_number().over(bySess))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("session_id"))
        .agg(concat_ws(">",
          max(when(col("rn") === 1, col("event_type"))),
          max(when(col("rn") === 2, col("event_type"))),
          max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
    }),

    // Association mining (market-basket over behavior): event-type
    // pairs co-occurring in a user's history, with integer-exact lift
    // = P(a∧b) / (P(a)·P(b)) computed as (n_ab·n_users·1e6) DIV
    // (n_a·n_b) — all longs (overflows only past ~10⁶ users × 10⁶
    // pair counts; past that the ratio moves to one double, the
    // moments pattern). Shapes: one distinct (user, type) pass, a
    // per-user self-join bounded by the TYPE alphabet (≤ C(5,2)=10
    // pairs per user, never n²), and two tiny aggregates.
    "events_cooccurrence" -> ((s, dir) => {
      val ut = events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint(true)
      val nUsers = ut.select(col("user_id")).distinct().count()
      val singles = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_single"))
      val pairs = ut.as("a")
        .join(ut.as("b"), Seq("user_id"))
        .filter(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(singles.select(col("event_type").as("type_a"), col("n_single").as("n_a")),
          Seq("type_a"))
        .join(singles.select(col("event_type").as("type_b"), col("n_single").as("n_b")),
          Seq("type_b"))
        .withColumn("lift_ppm",
          expr(s"n_both * $nUsers * 1000000 DIV (n_a * n_b)"))
        .select(col("type_a"), col("type_b"), col("n_both"), col("lift_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Semi-structured extraction: pull the integer k out of the JSON
    // props (regexp keeps it engine-portable), bucket by k % 10.
    "events_props_extract" -> ((s, dir) => {
      events(s, dir)
        .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"),
          col("value"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_cents"))
        .orderBy(col("k_mod"))
    }))

  val oracles: Map[String, String] = Map(
    "events_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
         s AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
         p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 COUNT(*) AS n_both
               FROM ut a JOIN ut b USING (user_id)
               WHERE a.event_type < b.event_type GROUP BY 1, 2)
         SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
           CAST(n_both * u.n_users * 1000000 // (sa.n * sb.n) AS BIGINT) AS lift_ppm
         FROM p, u
         JOIN s sa ON sa.event_type = p.type_a
         JOIN s sb ON sb.event_type = p.type_b
         ORDER BY type_a, type_b""",
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, event_id, us,
                 CASE WHEN us - lag(us) OVER w > 1800000000
                      OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         g AS (SELECT user_id, us,
                 CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM f)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec
         FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "events_asof_view_before_purchase" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                 CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
               FROM events WHERE event_type IN ('view', 'purchase')),
         f AS (SELECT *,
                 last_value(CASE WHEN is_view = 1 THEN event_id END IGNORE NULLS)
                   OVER w AS last_view_id,
                 last_value(CASE WHEN is_view = 1 THEN us END IGNORE NULLS)
                   OVER w AS last_view_us
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, is_view, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, us AS purchase_us, last_view_id, last_view_us
         FROM f WHERE event_type = 'purchase' ORDER BY event_id""",
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, MIN(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v USING(user_id)
               WHERE event_type = 'click' AND us > v_us GROUP BY 1),
         p AS (SELECT e.user_id, MIN(us) AS p_us FROM e JOIN c USING(user_id)
               WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
         SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
         UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
         UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
         ORDER BY stage""",
    "events_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us, value
            FROM events),
         x AS (SELECT *,
             MAX(CASE WHEN event_type = 'click' THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_c,
             MAX(CASE WHEN event_type = 'view' THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_v
           FROM e),
         p AS (SELECT
             CASE WHEN last_c IS NOT NULL AND us - last_c <= $ATTR_W_US THEN 'click'
                  WHEN last_v IS NOT NULL AND us - last_v <= $ATTR_W_US THEN 'view'
                  ELSE 'direct' END AS channel,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
           FROM x WHERE event_type = 'purchase')
         SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
         FROM p GROUP BY channel ORDER BY channel""",
    // Same stream-order windows: running click prefix, then the two
    // following-purchase mins (us + prefix — the first purchase's,
    // because the prefix is nondecreasing); no-click-between is the
    // prefix equality.
    "events_pattern_negation" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
         m AS (SELECT user_id, event_id, event_type, us,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_clicks
           FROM e),
         n AS (SELECT user_id, event_type, us, cum_clicks,
             MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER w2 AS next_p_us,
             MIN(CASE WHEN event_type = 'purchase' THEN cum_clicks END) OVER w2
               AS next_p_cum
           FROM m WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(SUM(CASE WHEN next_p_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_purchase,
           CAST(SUM(CASE WHEN next_p_us IS NOT NULL AND next_p_cum = cum_clicks
             THEN 1 ELSE 0 END) AS BIGINT) AS n_direct,
           CAST(SUM(CASE WHEN next_p_us IS NOT NULL AND next_p_cum <> cum_clicks
             THEN 1 ELSE 0 END) AS BIGINT) AS n_intervened,
           CAST(COALESCE(SUM(CASE WHEN next_p_us IS NOT NULL
             AND next_p_cum = cum_clicks THEN next_p_us - us END), 0) AS BIGINT)
             AS direct_gap_us_sum
         FROM n WHERE event_type = 'view'""",
    "events_changepoint" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
              CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1),
         seq AS (SELECT hour, x,
             CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) AS t,
             CAST(SUM(x) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
           FROM h),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS total FROM seq)
         SELECT hour AS cp_hour, t AS cp_index, n AS n_hours, total AS total_events,
           abs(n * prefix - t * total) AS cusum_stat,
           prefix * 1000000 // t AS mean_before_ppm,
           (total - prefix) * 1000000 // (n - t) AS mean_after_ppm
         FROM seq, tot WHERE t < n
         ORDER BY abs(n * prefix - t * total) DESC, hour LIMIT 1""",
    "events_funnel_windowed" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         x AS (SELECT *,
             MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
           FROM e),
         y AS (SELECT *,
             MIN(CASE WHEN event_type = 'click' THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c,
             MIN(CASE WHEN event_type = 'click' AND next_p IS NOT NULL
                   AND next_p - us <= $FUNNEL_W_US THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_cc
           FROM x),
         v AS (SELECT * FROM y WHERE event_type = 'view')
         SELECT '1_view' AS stage,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM v
         UNION ALL SELECT '2_click_6h', CAST(COUNT(DISTINCT user_id) AS BIGINT)
           FROM v WHERE next_c IS NOT NULL AND next_c - us <= $FUNNEL_W_US
         UNION ALL SELECT '3_purchase_6h', CAST(COUNT(DISTINCT user_id) AS BIGINT)
           FROM v WHERE next_cc IS NOT NULL AND next_cc - us <= $FUNNEL_W_US
         ORDER BY stage""",
    "events_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
         SELECT cohort_day, day - cohort_day AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN f USING(user_id)
         GROUP BY 1, 2 ORDER BY cohort_day, day_offset""",
    "events_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         f AS (SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
                      OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         g AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM f),
         h AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                 ORDER BY us, event_id) AS rn FROM g),
         p AS (SELECT user_id, session_id,
                 concat_ws('>', MAX(CASE WHEN rn = 1 THEN event_type END),
                                MAX(CASE WHEN rn = 2 THEN event_type END),
                                MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
               FROM h WHERE rn <= 3 GROUP BY 1, 2)
         SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p
         GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 10""",
    "events_props_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_mod,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1 ORDER BY k_mod""")
}
