package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ExtendedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of the exact cardinalities") {
    val apx = Extended.queries("approx_distinct_stats")(spark, sf).head()
    val exact = Tables(spark, sf, "lineitem").agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey"))).head()
    (0 until 3).foreach { i =>
      val (a, e) = (apx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"col $i: approx $a vs exact $e")
    }
  }

  test("approx_percentile lands within 2% of the exact percentiles") {
    val apx = Extended.queries("approx_percentile_prices")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Extended.queries("percentile_prices")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(apx.keySet === exact.keySet)
    exact.foreach { case (status, (p50, p90)) =>
      val (a50, a90) = apx(status)
      assert(math.abs(a50 - p50).toDouble / p50 <= 0.02, s"$status p50: $a50 vs $p50")
      assert(math.abs(a90 - p90).toDouble / p90 <= 0.02, s"$status p90: $a90 vs $p90")
    }
  }

  test("range join covers every event exactly once (bands partition the domain)") {
    val total = Tables(spark, sf, "events").count()
    val joined = Extended.queries("range_join_value_bands")(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(joined === total)
  }
}
