package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ExtendedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // The audit queries fold the sketch-error bounds into their own
  // output (within-bound booleans the oracle expects TRUE); these
  // specs assert the booleans AND that the exact columns agree with an
  // independently computed exact answer, so a sketch regression fails
  // here even without the DuckDB gate.
  test("approx_distinct audit: exact columns correct, HLL within 5% (booleans true)") {
    val row = Extended.queries("approx_distinct_stats")(spark, sf).head()
    val exact = Tables(spark, sf, "lineitem").agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey"))).head()
    Seq("n_orders", "n_parts", "n_supps").zipWithIndex.foreach { case (n, i) =>
      assert(row.getAs[Long](n) === exact.getLong(i), s"exact $n must match")
    }
    Seq("orders_within_5pct", "parts_within_5pct", "supps_within_5pct").foreach { b =>
      assert(row.getAs[Boolean](b), s"HLL estimate out of its 5% bound ($b)")
    }
  }

  test("approx_percentile audit: exact cents correct, sketch within 2% (booleans true)") {
    val audit = Extended.queries("approx_percentile_prices")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Extended.queries("percentile_prices")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.keySet === exact.keySet)
    exact.foreach { case (status, (p50, p90)) =>
      val r = audit(status)
      assert((r.getLong(1), r.getLong(2)) === ((p50, p90)),
        s"$status: exact percentile columns must match percentile_prices")
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"$status: approx_percentile out of its 2% bound")
    }
  }

  test("range join covers every event exactly once (bands partition the domain)") {
    val total = Tables(spark, sf, "events").count()
    val joined = Extended.queries("range_join_value_bands")(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(joined === total)
  }
}
