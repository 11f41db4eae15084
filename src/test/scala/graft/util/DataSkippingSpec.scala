package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zone-map contracts: stats are per-file exact, pruning keeps every
  * may-match file and drops the rest, pruned reads equal full-scan
  * filters, and the z-order key interleaves bits correctly.
  */
class DataSkippingSpec extends SparkSpec {

  import spark.implicits._

  private def writeSorted(): String = {
    val dir = tmpDir("skip") + "/t"
    // 4 files with disjoint id ranges: [0,24], [25,49], [50,74], [75,99].
    (0 until 4).foreach { f =>
      (f * 25 until (f + 1) * 25).map(i => (i.toLong, i * 2L)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("collectStats: per-file min/max/count are exact") {
    val stats = DataSkipping.collectStats(spark, writeSorted(), Seq("id"))
    val zones = stats.select("min_id", "max_id", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(zones === Set((0L, 24L, 25L), (25L, 49L, 25L), (50L, 74L, 25L), (75L, 99L, 25L)))
  }

  test("pruneRanges keeps exactly the intersecting zones") {
    val dir = writeSorted()
    val stats = DataSkipping.collectStats(spark, dir, Seq("id"))
    assert(DataSkipping.pruneRanges(stats, Seq(("id", 30L, 60L))).size === 2)
    assert(DataSkipping.pruneRanges(stats, Seq(("id", 0L, 99L))).size === 4)
    assert(DataSkipping.pruneRanges(stats, Seq(("id", 200L, 300L))).isEmpty)
    // Zone boundaries are inclusive on both ends.
    assert(DataSkipping.pruneRanges(stats, Seq(("id", 24L, 25L))).size === 2)
  }

  test("readRanges equals the full-scan filter and actually skips files") {
    val dir = writeSorted()
    val (rows, nRead, nTotal) =
      DataSkipping.readRanges(spark, dir, Seq(("id", 30L, 60L)))
    assert(nTotal === 4 && nRead === 2)
    val full = spark.read.parquet(dir).filter(col("id") >= 30 && col("id") <= 60)
    assert(rows.exceptAll(full).isEmpty && full.exceptAll(rows).isEmpty)
    val (empty, nReadE, _) = DataSkipping.readRanges(spark, dir, Seq(("id", 200L, 300L)))
    assert(nReadE === 0 && empty.count() === 0)
  }

  test("bloom index: no false negatives, real skipping, read equals full scan") {
    val dir = tmpDir("bloom") + "/t"
    // 8 files, each holding one disjoint residue class of ids mod 8 —
    // the hash-clustered layout where zone maps are useless (every
    // file spans ~the full id range) but a point lookup lives in
    // exactly one file.
    (0 until 8).foreach { f =>
      (0 until 1000).filter(_ % 8 == f).map(i => (i.toLong, i * 2L)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val keys = Seq(17L, 642L, 901L) // residues 1, 2, 5 — three distinct files
    val (rows, nRead, nTotal) = DataSkipping.readPointLookups(spark, dir, "id", keys)
    assert(nTotal === 8)
    // May-contain: at least the 3 true files, plus rare false positives.
    assert(nRead >= 3 && nRead < 8, s"read $nRead of $nTotal")
    val full = spark.read.parquet(dir).filter(col("id").isin(keys: _*))
    assert(rows.exceptAll(full).isEmpty && full.exceptAll(rows).isEmpty)
    assert(rows.count() === 3)
    // Absent keys: prune may keep false-positive files, but the exact
    // re-filter must return nothing.
    val (absent, _, _) = DataSkipping.readPointLookups(spark, dir, "id", Seq(5000L))
    assert(absent.count() === 0)
  }

  test("zorderKey interleaves bits: (a,b) -> sum of a-bits at even, b-bits at odd") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("a", "b")
      .withColumn("z", DataSkipping.zorderKey(col("a"), col("b"), 6))
    val z = df.orderBy("a", "b").collect().map(_.getLong(2))
    // Expected via reference interleave on the driver.
    def ref(a: Long, b: Long): Long =
      (0 until 6).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    assert(z.toSeq === Seq(ref(0, 0), ref(0, 1), ref(1, 0), ref(3, 5), ref(63, 63)))
    // Locality: adjacent (a,b) cells share high bits — the [0,1]x[0,1]
    // quad packs into z < 4 while (2,0) jumps to its own quad.
    assert(ref(1, 1) < 4 && ref(2, 0) === 4)
  }
}
