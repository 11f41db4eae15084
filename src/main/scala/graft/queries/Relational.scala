package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryGroup, Tables}

/** Relational operator inventory over the TPC-H-ish testdata.
  *
  * Numeric policy (hash-match with the DuckDB oracle requires bit-exact
  * values): money/value doubles are floored to integer cents
  * (`floor(x*100)` → long) or micro-units (`floor(x*1e6)`) per row
  * *before* any aggregation. IEEE-754 double multiply + floor is
  * bit-identical in Spark and DuckDB, and long sums are exact and
  * order-independent — unlike `CAST(double AS DECIMAL)`, whose rounding
  * of the binary expansion differs between the engines (Spark rounds the
  * shortest decimal string, DuckDB the exact expansion). Integer-valued
  * counts are emitted as LongType. Every output is totally ordered by a
  * unique key so row order is deterministic on both sides.
  */
object Relational extends QueryGroup {

  private def cents(c: Column): Column = floor(c * 100)
  private def micros(c: Column): Column = floor(c * 1000000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan + filter + hash aggregate with partial
    // (map-side) aggregation; the filter and the 7-column projection are
    // pushed into the parquet scan.
    "q1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
          sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price_micros"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 shape: 3-way join narrowed by selective filters, then
    // top-k by aggregate. customer grows linearly with SF, so it gets
    // NO broadcast hint — Spark's size-based planning (auto-broadcast
    // threshold + AQE) broadcasts it while it fits and falls back to a
    // shuffled join at scale; lineitem⋈orders shuffles on the join key.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
        .orderBy(col("revenue_micros").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: star join. Only the fixed-cardinality dims
    // (nation = 25 rows, region = 5) carry an explicit broadcast hint;
    // customer scales with SF, so its join is left to size-based
    // planning (broadcast while small, shuffled at scale).
    "q5_revenue_by_nation" -> ((s, dir) => {
      val region = Tables(s, dir, "region")
      val nation = Tables(s, dir, "nation")
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_micros"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q7 shape (volume shipping): the six-way join with TWO
    // roles for the same dimension — nation joined once through the
    // supplier leg and once through the customer leg. The fact-side
    // joins (lineitem⋈orders on orderkey) shuffle on the fact keys.
    // Only the two nation aliases (25 rows each, fixed for any SF)
    // carry an explicit broadcast hint; supplier and customer grow
    // linearly with SF, so their joins are left to size-based planning
    // — broadcast while they fit the threshold, shuffled hash / SMJ on
    // the key at the 100 TB scale where a forced broadcast would OOM.
    // Revenue in floor-cents per row (exact long sums).
    "q7_nation_volume" -> ((s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100))
            .cast("long").as("revenue_cents"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q10 shape (returned-item losses): fact filter pushed to
    // the scan (l_returnflag = 'R'), two joins, a customer-grain
    // aggregate, then a global top-20 by revenue — which must plan as
    // TakeOrderedAndProject (distributed per-partition top-k), never
    // a single-task global sort. The customer join carries NO
    // broadcast hint (customer scales linearly with SF); size-based
    // planning broadcasts it at test SFs and shuffles at scale.
    "q10_returned_items" -> ((s, dir) => {
      Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100))
            .cast("long").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey")).limit(20)
    }),

    // TPC-H Q18 shape (large-volume orders): group-by-fact-key HAVING,
    // then enrich the few survivors and take a global top-k. The
    // aggregate runs FIRST, on lineitem alone — the HAVING filter cuts
    // the fact table to the handful of qualifying orders BEFORE any
    // join, so the orders/customer joins see thousands of rows, not
    // billions, and the per-order quantity sum is reused as the output
    // column instead of re-aggregating the joined rows (the classic
    // Q18 rewrite: the IN-subquery and the outer GROUP BY are the same
    // aggregate). Customer carries no broadcast hint (SF-scaling dim,
    // size-gated like q3/q5/q7/q10); the top-100 must plan as
    // TakeOrderedAndProject.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_cents"))
        .filter(col("sum_qty_cents") > 25000L)
      big.join(Tables(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
          cents(col("o_totalprice")).as("total_price_cents"), col("sum_qty_cents"))
        .orderBy(col("total_price_cents").desc, col("o_orderkey")).limit(100)
    }),

    // TPC-H Q4 shape (order priority checking): EXISTS-grouped count —
    // the decorrelated semi join runs BEFORE the aggregate, so the
    // group-by sees only qualifying orders. The date predicate is the
    // testdata's analog of Q4's commit/receipt lateness (no
    // l_commitdate column): a line shipped more than 60 days after the
    // order date. Both sides shuffle on orderkey; the output is
    // 5 rows whatever the SF.
    "q4_order_priority" -> ((s, dir) => {
      val late = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      Tables(s, dir, "orders")
        .join(late,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q6 shape (forecast revenue): the pure scan-predicate
    // aggregate — every filter is scan-pushable (shipdate range,
    // discount band, quantity cap) and the projection is 2 columns, so
    // the parquet reader materializes a fraction of the table and the
    // aggregate is one mergeable partial. PlanContractsSpec pins the
    // pushed filters + pruned read schema.
    "q6_forecast_revenue" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_discount") >= 0.04 && col("l_discount") <= 0.08 &&
          col("l_quantity") < 24.0)
        .agg(sum(micros(col("l_extendedprice") * col("l_discount"))).as("revenue_micros"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q8 shape (national market share): the two-role nation join
    // again (supplier leg vs customer leg), a region gate on the
    // customer side, and a share-of-total per year. The share is
    // emitted as two exact integer columns (nation numerator + total
    // denominator) instead of an engine-dependent double division.
    // Fixed-cardinality nation/region broadcast; part/supplier/
    // customer are SF-scaling and stay size-gated.
    "q8_market_share" -> ((s, dir) => {
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      val promo = Tables(s, dir, "part").filter(col("p_type") === "PROMO")
      val america = Tables(s, dir, "region").filter(col("r_name") === "AMERICA")
      Tables(s, dir, "lineitem")
        .join(promo, col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(america), col("c_rk") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3",
            micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(lit(0L))).as("nation_micros"),
          sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_micros"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q13 shape (customer order distribution): LEFT OUTER join +
    // two-level aggregate — per-customer order count (customers with no
    // qualifying orders land in the 0 bucket through the outer join's
    // null side), then the count-of-counts distribution. The first
    // aggregate shuffles on custkey, the second on the (tiny) count
    // domain; no broadcast hints on either SF-scaling input.
    "q13_customer_distribution" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = Tables(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 shape (promo revenue): fact⋈part with a conditional
    // aggregate — the promo share emitted as exact integer numerator +
    // denominator (same no-division discipline as q8). The shipdate
    // window is scan-pushed; part carries no hint (SF-scaling).
    "q14_promo_revenue" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-07-01")))
        .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(lit(0L))).as("promo_micros"),
          sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_micros"))
    }),

    // TPC-H Q15 shape (top supplier): per-supplier revenue aggregate,
    // then keep the row(s) equal to the global max — the scalar max is
    // a 1-row aggregate joined back (broadcast of one row), never a
    // global sort. Catalyst reuses the aggregated view on both sides
    // via exchange/subquery reuse.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_revenue_micros"))
      val top = rev.agg(max(col("total_revenue_micros")).as("max_rev"))
      rev.join(broadcast(top), col("total_revenue_micros") === col("max_rev"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_micros"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part average subquery, decorrelated into one aggregate join
    // — lineitem is scanned once for the per-part moments and once for
    // the probe, both shuffling on partkey. The 0.2·avg comparison is
    // integer cross-multiplied (5·n·qty_cents < sum_qty_cents) so no
    // double division happens in either engine.
    "q17_small_quantity" -> ((s, dir) => {
      val brand = Tables(s, dir, "part").filter(col("p_brand") === "Brand#23")
      val li = Tables(s, dir, "lineitem")
      val moments = li.groupBy(col("l_partkey").as("m_partkey"))
        .agg(count(lit(1)).as("n_part_lines"),
          sum(cents(col("l_quantity"))).as("sum_qty_cents"))
      li.join(brand, col("l_partkey") === col("p_partkey"))
        .join(moments, col("l_partkey") === col("m_partkey"))
        .filter(cents(col("l_quantity")) * lit(5) * col("n_part_lines") <
          col("sum_qty_cents"))
        .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // three OR-of-AND branches mixing join-side (brand/size) and
    // fact-side (quantity) conjuncts. The common equi-key join stays a
    // single hash join; the disjunction evaluates as a post-join
    // filter with the fact-only quantity bounds (qty ≤ 30 across
    // branches) still scan-pushable.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20.0, 30.0)))
        .agg(sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_micros"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q12 shape (shipmode lateness classification): one
    // lineitem⋈orders join with CONDITIONAL aggregation — the
    // shipdate-year filter is scan-pushable; the lateness predicate
    // (shipped >60 days after order date, the corpus's receipt/commit
    // analog, as q4) needs both sides so it rides the orderkey join
    // as a residual. l_returnflag stands in for l_shipmode (the
    // corpus has no shipmode column); priority split mirrors Q12's
    // URGENT/HIGH vs rest CASE sums. 3 rows at any SF.
    "q12_shipmode_priority" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")))
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // correlated-pair plan shape — one EXISTS and one NOT EXISTS
    // against the SAME fact table. A supplier "kept an order waiting"
    // when it shipped late (the q4/q12 lateness analog) on a
    // finished multi-supplier order where NO other supplier was late.
    // The lateness flag needs o_orderdate, so lineitem⋈orders(F) is
    // derived ONCE and both subqueries are self-joins against that
    // frame: the EXISTS compiles to a LeftSemi and the NOT EXISTS to
    // a LeftAnti, both keyed on l_orderkey with the suppkey
    // inequality as a join residual — never per-row subplans
    // (PlanContractsSpec pins both). distinct() makes numwait count
    // ORDERS kept waiting, not late lines. Top-100 via
    // TakeOrderedAndProject.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val lateBy = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      val fin = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          lateBy.as("late"))
      val l1 = fin.filter(col("late")).select(col("ok"), col("sk")).distinct()
      val others = fin.select(col("ok").as("ok2"), col("sk").as("sk2"),
        col("late").as("late2"))
      val waiting = l1
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
          "left_semi")
        .join(others.filter(col("late2")),
          col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_anti")
      waiting
        .join(Tables(s, dir, "supplier"), col("sk") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 shape (global sales opportunity): customers above the
    // global positive-balance average (scalar subquery, integer
    // cross-multiplied: acctbal_cents · n_pos > sum_pos_cents) that
    // went dormant — no order in the final year (anti join with a
    // scan-pushed date filter on the orders side; this corpus has no
    // order-free customers, so the date gate IS the Q22 "no recent
    // order" predicate). The scalar average is a 1-row broadcast; the
    // anti join shuffles on custkey. Grouped by nation.
    "q22_dormant_customers" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val avgPos = cust.filter(col("c_acctbal") > 0.0)
        .agg(count(lit(1)).as("n_pos"),
          sum(cents(col("c_acctbal"))).as("sum_pos_cents"))
      val recent = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-07-01")))
      cust.crossJoin(broadcast(avgPos))
        .filter(cents(col("c_acctbal")) * col("n_pos") > col("sum_pos_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(cents(col("c_acctbal"))).as("totacctbal_cents"))
        .orderBy(col("c_nationkey"))
    }),

    // Semi join (EXISTS): orders that contain at least one big line.
    "join_semi_big_lines" -> ((s, dir) => {
      val big = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49.0)
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // Anti join (NOT EXISTS): customers with no urgent order — the
    // engine's idiom for UNIQUE-constraint style "insert only new keys"
    // (SURVEY.md §2.3 dedup).
    "join_anti_no_orders" -> ((s, dir) => {
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      Tables(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Window: rank customers by total spend within market segment.
    "window_top_spenders" -> ((s, dir) => {
      val totals = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("total_spend_cents"))
      val cust = Tables(s, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("total_spend_cents").desc, col("c_custkey"))
      cust.join(totals, col("c_custkey") === col("o_custkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("total_spend_cents"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // Window: running sum over an explicit ROWS frame.
    "window_running_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .filter(col("o_custkey") % 100 === 0)
        .withColumn("running_spend_cents", sum(cents(col("o_totalprice"))).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Sort + limit (top-k by value with deterministic tie-break).
    "sort_topk_orders" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Set op: UNION ALL of two disjoint selections.
    "union_priorities" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      val low = o.filter(col("o_orderpriority") === "5-LOW")
      urgent.unionAll(low)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // Distinct.
    "distinct_segments" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"))
        .distinct()
        .orderBy(col("c_mktsegment"))
    }),

    // Global aggregate: count / exact count-distinct / min / max.
    "agg_global_stats" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        cents(min(col("l_extendedprice"))).as("min_price_cents"),
        cents(max(col("l_extendedprice"))).as("max_price_cents"))
    }),

    // Grouping sets via ROLLUP (status, priority) → includes subtotal and
    // grand-total rows with NULL keys.
    "rollup_order_counts" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // CASE WHEN bucketing + aggregation.
    "case_quantity_buckets" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 35, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(cents(col("l_quantity"))).as("qty_cents"))
        .orderBy(col("bucket"))
    }),

    // Correlated EXISTS / NOT EXISTS — expressed as SQL subqueries so
    // Catalyst's decorrelation (RewritePredicateSubquery) does the
    // rewrite: EXISTS → left-semi join, NOT EXISTS → left-anti join,
    // both shuffle-partitionable equi-joins at any scale. The
    // DataFrame twins (join_semi_big_lines / join_anti_no_orders)
    // pin the hand-written form; this pins the declared form.
    "subquery_exists_urgent" -> ((s, dir) => {
      val c = s"customer_sq_${System.identityHashCode(s)}"
      val o = s"orders_sq_${System.identityHashCode(s)}"
      Tables(s, dir, "customer").createOrReplaceTempView(c)
      Tables(s, dir, "orders").createOrReplaceTempView(o)
      s.sql(
        s"""SELECT c_custkey, c_name FROM $c
            WHERE EXISTS (SELECT 1 FROM $o
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
              AND NOT EXISTS (SELECT 1 FROM $o
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'F')
            ORDER BY c_custkey""")
    }),

    // Correlated scalar subqueries: suppliers above their nation's
    // average balance. The average is compared by integer
    // cross-multiplication (balance_cents · n > sum_cents) so no
    // engine-dependent double division ever happens — the same
    // integer-moments discipline as stat_moments_corr. Catalyst
    // decorrelates both scalar subqueries into one aggregate join.
    "subquery_scalar_above_avg" -> ((s, dir) => {
      val v = s"supplier_sq_${System.identityHashCode(s)}"
      Tables(s, dir, "supplier").createOrReplaceTempView(v)
      s.sql(
        s"""SELECT s_suppkey, s_name,
              CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS acctbal_cents
            FROM $v s
            WHERE CAST(FLOOR(s_acctbal * 100) AS BIGINT) *
                  (SELECT COUNT(*) FROM $v x
                   WHERE x.s_nationkey = s.s_nationkey)
                  > (SELECT SUM(CAST(FLOOR(x.s_acctbal * 100) AS BIGINT))
                     FROM $v x WHERE x.s_nationkey = s.s_nationkey)
            ORDER BY s_suppkey""")
    }),

    // Row-level scalar function surface: string + date functions, all
    // whole-stage-codegen built-ins.
    "scalar_string_date" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 1000 === 0)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderstatus"), 1, 1).as("status_c"),
          length(col("o_orderpriority")).cast("long").as("pri_len"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"))
        .orderBy(col("o_orderkey"))
    }))

  val oracles: Map[String, String] = Map(
    "subquery_exists_urgent" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "subquery_scalar_above_avg" ->
      """SELECT s_suppkey, s_name,
           CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS acctbal_cents
         FROM supplier s
         WHERE CAST(FLOOR(s_acctbal * 100) AS BIGINT) *
               (SELECT COUNT(*) FROM supplier x
                WHERE x.s_nationkey = s.s_nationkey)
               > (SELECT SUM(CAST(FLOOR(x.s_acctbal * 100) AS BIGINT))
                  FROM supplier x WHERE x.s_nationkey = s.s_nationkey)
         ORDER BY s_suppkey""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS sum_disc_price_micros,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS revenue_micros
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1998-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue_micros DESC, l_orderkey LIMIT 10""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_returnflag = 'R'
         GROUP BY 1, 2, 3
         ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name < n2.n_name
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q5_revenue_by_nation" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS revenue_micros
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
           FROM lineitem GROUP BY l_orderkey
           HAVING SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) > 25000)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_price_cents,
           big.sum_qty_cents
         FROM big JOIN orders ON o_orderkey = big.l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY total_price_cents DESC, o_orderkey LIMIT 100""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q6_forecast_revenue" ->
      """SELECT
           CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1000000) AS BIGINT)) AS BIGINT) AS revenue_micros,
           COUNT(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.04 AND l_discount <= 0.08
           AND l_quantity < 24.0""",
    "q8_market_share" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
             THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS nation_micros,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS total_micros
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         GROUP BY 1 ORDER BY 1""",
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey) t
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q14_promo_revenue" ->
      """SELECT
           CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS promo_micros,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS total_micros
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-07-01'""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS total_revenue_micros
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue_micros
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue_micros = (SELECT MAX(total_revenue_micros) FROM rev)
         ORDER BY s_suppkey""",
    "q17_small_quantity" ->
      """WITH moments AS (
           SELECT l_partkey AS m_partkey, COUNT(*) AS n_part_lines,
             CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
           FROM lineitem GROUP BY l_partkey)
         SELECT
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
         JOIN moments ON l_partkey = m_partkey
         WHERE CAST(FLOOR(l_quantity * 100) AS BIGINT) * 5 * n_part_lines < sum_qty_cents""",
    "q19_disjunctive_revenue" ->
      """SELECT
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS revenue_micros,
           COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1.0 AND 11.0)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10.0 AND 20.0)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20.0 AND 30.0)""",
    "q12_shipmode_priority" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q21_waiting_suppliers" ->
      """WITH fin AS (
           SELECT l_orderkey AS ok, l_suppkey AS sk,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           WHERE o_orderstatus = 'F'),
         l1 AS (SELECT DISTINCT ok, sk FROM fin WHERE late),
         waiting AS (
           SELECT l1.ok, l1.sk FROM l1
           WHERE EXISTS (SELECT 1 FROM fin l2
                         WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
             AND NOT EXISTS (SELECT 1 FROM fin l3
                             WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late))
         SELECT n_name, s_name, COUNT(*) AS numwait
         FROM waiting JOIN supplier ON s_suppkey = sk
         JOIN nation ON n_nationkey = s_nationkey
         GROUP BY 1, 2
         ORDER BY numwait DESC, s_name LIMIT 100""",
    "q22_dormant_customers" ->
      """WITH avg_pos AS (
           SELECT COUNT(*) AS n_pos,
             CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_pos_cents
           FROM customer WHERE c_acctbal > 0.0)
         SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
         FROM customer, avg_pos
         WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos_cents
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-07-01')
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "join_semi_big_lines" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
         ORDER BY o_orderkey""",
    "join_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "window_top_spenders" ->
      """WITH totals AS (
           SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_spend_cents
           FROM orders GROUP BY o_custkey)
         SELECT c_mktsegment, rn, c_custkey, total_spend_cents FROM (
           SELECT c_mktsegment,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY total_spend_cents DESC, c_custkey) AS BIGINT) AS rn,
             c_custkey, total_spend_cents
           FROM customer JOIN totals ON c_custkey = o_custkey) t
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "window_running_spend" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_spend_cents
         FROM orders WHERE o_custkey % 100 = 0
         ORDER BY o_custkey, o_orderkey""",
    "sort_topk_orders" ->
      """SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
         FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 20""",
    "union_priorities" ->
      """SELECT o_orderkey, o_orderpriority FROM (
           SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW') t
         ORDER BY o_orderkey""",
    "distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "agg_global_stats" ->
      """SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT l_orderkey) AS n_orders,
         COUNT(DISTINCT l_partkey) AS n_parts,
         CAST(FLOOR(MIN(l_extendedprice) * 100) AS BIGINT) AS min_price_cents,
         CAST(FLOOR(MAX(l_extendedprice) * 100) AS BIGINT) AS max_price_cents
         FROM lineitem""",
    "rollup_order_counts" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "case_quantity_buckets" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'small'
                     WHEN l_quantity < 35 THEN 'medium'
                     ELSE 'large' END AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
         FROM lineitem GROUP BY 1 ORDER BY bucket""",
    "scalar_string_date" ->
      """SELECT o_orderkey,
         UPPER(o_orderpriority) AS pri_upper,
         SUBSTRING(o_orderstatus, 1, 1) AS status_c,
         CAST(LENGTH(o_orderpriority) AS BIGINT) AS pri_len,
         o_orderstatus || '-' || o_orderpriority AS status_pri,
         CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
         CAST(MONTH(o_orderdate) AS BIGINT) AS order_month
         FROM orders WHERE o_orderkey % 1000 = 0 ORDER BY o_orderkey""")
}
