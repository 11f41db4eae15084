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

  test("resize rewrites blob and metadata to the target budget") {
    val media = MediaOps.fakeMediaTable(spark, sf).limit(5)
    val out = MediaOps.resize(media, 64, 64)
    val sizes = out.select(col("meta.n_bytes"), col("meta.width"), col("meta.height"))
      .collect()
    assert(sizes.forall(r => r.getLong(0) === 64L * 64 / 256 + 1))
    assert(sizes.forall(r => r.getInt(1) === 64 && r.getInt(2) === 64))
  }
}
