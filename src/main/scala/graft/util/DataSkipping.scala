package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (per-file min/max/count statistics) and the
  * pruned reads they enable — the manifest-statistics pattern every
  * large table format uses for data skipping: a range predicate first
  * consults the stats table, then opens ONLY the files whose zone may
  * intersect. On a sorted or z-ordered layout that turns an O(table)
  * scan into an O(matching files) scan; at 100 TB the stats table (one
  * row per file) is millions of times smaller than the data and lives
  * happily broadcast or on the driver, exactly like a format manifest.
  *
  * Zone pruning is MAY-CONTAIN: the surviving files are a superset of
  * the matching rows, so [[readRange]] re-applies the exact predicate
  * after the scan (same contract as parquet row-group statistics, one
  * level up).
  */
object DataSkipping {

  /** Per-file stats for `cols`: `_file`, `n_rows`, and `min_c`/`max_c`
    * per column. One pass over the directory; at scale this is the
    * artifact you persist per table snapshot and maintain per commit.
    */
  def collectStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .select(input_file_name().as("_file") +: cols.map(col): _*)
      .groupBy(col("_file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Files whose `[min, max]` zone intersects `[lo, hi]` on every
    * given column (conjunctive ranges — the multi-dimensional case a
    * z-ordered layout serves).
    */
  def pruneRanges(stats: DataFrame, ranges: Seq[(String, Long, Long)]): Seq[String] = {
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    stats.filter(pred).select(col("_file")).collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that may contain rows matching the ranges and
    * re-apply the exact predicate. Returns (rows, filesRead,
    * filesTotal) so callers can assert the skip actually happened.
    */
  def readRanges(spark: SparkSession, dir: String,
      ranges: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    val stats = collectStats(spark, dir, ranges.map(_._1)).localCheckpoint(true)
    val total = stats.count().toInt
    val keep = pruneRanges(stats, ranges)
    val exact = ranges.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    val df =
      if (keep.isEmpty)
        spark.read.parquet(dir).filter(exact).limit(0)
      else spark.read.parquet(keep: _*).filter(exact)
    (df, keep.size, total)
  }

  /** Bit-interleaved z-order key over two already-bounded non-negative
    * columns (each < 2^bits): locality in BOTH dimensions maps to
    * locality in the key, so range-partitioning by the key gives every
    * file a tight zone in each dimension — the layout that makes
    * multi-dimensional zone pruning effective where a single-column
    * sort only serves its leading column.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
}
