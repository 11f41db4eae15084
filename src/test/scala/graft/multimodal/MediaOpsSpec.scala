package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediaOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table has binary blobs with consistent metadata") {
    val media = MediaOps.fakeMediaTable(spark, sf)
    assert(media.schema("bytes").dataType.typeName === "binary")
    val mismatched = media
      .filter(octet_length(col("bytes")) =!= col("meta.n_bytes")).count()
    assert(mismatched === 0)
  }

  test("feature extraction is deterministic and fixed-dim") {
    val media = MediaOps.fakeMediaTable(spark, sf).limit(20)
    val f1 = MediaOps.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MediaOps.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 20)
    assert(f1.forall(_.features.length === MediaOps.FEATURE_DIM))
    f1.zip(f2).foreach { case (a, b) => assert(a.features.sameElements(b.features)) }
  }

  test("frame sampling matches the ceil(bytes/FRAME_BYTES) contract") {
    val media = MediaOps.fakeMediaTable(spark, sf).limit(10)
    val frames = MediaOps.sampleFrames(media)
    val got = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = media.select(col("media_id"), col("meta.n_bytes")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) + MediaOps.FRAME_BYTES - 1) / MediaOps.FRAME_BYTES))
      .toMap
    assert(got === want)
  }

  test("phash banding is exact blocking at hamming <= 3 (vs brute force); identical blobs collide at 0") {
    import spark.implicits._
    // Synthetic blobs: 40 deterministic 8-chunk items, one planted
    // identical pair (ids 100/101) and one near-dup pair sharing 511
    // of 512 chunks (ids 102/103) — a changed chunk shifts each bit's
    // vote by at most 2, and with 512 voters the typical |margin| is
    // ~sqrt(512), so a single chunk flips ~1 signature bit in
    // expectation (deterministic here: fixed content, fixed hamming).
    def blob(seed: Int, chunks: Int, change: Int = -1): Array[Byte] =
      (0 until chunks).flatMap { c =>
        val tag = if (c == change) s"X$seed:$c" else s"chunk$seed:$c"
        val base = (tag + "-" * MediaOps.FRAME_BYTES).take(MediaOps.FRAME_BYTES)
        base.getBytes("UTF-8").toSeq
      }.toArray
    val rows =
      (0 until 40).map(i => (i.toLong, "image", blob(i, 8))) ++ Seq(
        (100L, "image", blob(900, 8)), (101L, "image", blob(900, 8)),
        (102L, "image", blob(901, 512)), (103L, "image", blob(901, 512, change = 7)))
    val media = rows.toDF("media_id", "kind", "bytes")
    val sigs = MediaOps.phashBands(media).localCheckpoint(true)
    val banded = MediaOps.phashDupPairs(sigs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // Brute force over the collected signatures: all ordered pairs at
    // hamming <= 3 — the pigeonhole claim is banded == brute force.
    val sv = sigs.collect().map(r =>
      r.getLong(0) -> (0 until 4).map(k => r.getLong(2 + k))).toMap
    val brute = (for {
      (a, ba) <- sv.toSeq; (b, bb) <- sv.toSeq if a != b
      h = (0 until 4).map(k => java.lang.Long.bitCount(ba(k) ^ bb(k))).sum.toLong
      if h <= 3
    } yield (a, b, h)).toSet
    assert(banded === brute, "banded join must find exactly the brute-force d<=3 pairs")
    assert(banded.contains((100L, 101L, 0L)), "identical blobs must collide at hamming 0")
    assert(banded.exists(p => p._1 == 102L && p._2 == 103L),
      "one changed chunk in 32 must stay within the d<=3 near-dup radius")
  }

  test("resize rewrites blob and metadata to the target budget") {
    val media = MediaOps.fakeMediaTable(spark, sf).limit(5)
    val out = MediaOps.resize(media, 64, 64)
    val sizes = out.select(col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .collect()
    assert(sizes.forall(r => r.getLong(0) === 64L * 64 / 256 + 1))
    assert(sizes.forall(r => r.getInt(1) === 64 && r.getInt(2) === 64))
  }
}
