package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages. The container has no codec libraries, so the DECODE step is a
  * deterministic fake (documented per method); everything Spark-side —
  * schema, binary handling, partition-iterator plumbing, batch shapes,
  * output contracts — is real and tested. In PySpark the per-partition
  * stages would be Pandas UDFs over mapInPandas; the Scala-native
  * equivalent is mapPartitions over a typed Dataset, which keeps the
  * same "one iterator per partition, stream batches through a model"
  * shape a real extractor (ONNX/JNI codec) would plug into.
  *
  * Scale notes: media blobs make row sizes KB-MB; the knobs that matter
  * at 100 TB are spark.sql.files.maxPartitionBytes (bound partition
  * memory), binary columns NEVER in join/shuffle keys (metadata joins
  * carry media_id only), and feature extraction emitting narrow rows so
  * the expensive shuffle ships 64 floats, not the blob.
  */
object MediaOps {

  val KINDS = Seq("image", "audio", "video")
  val FEATURE_DIM = 64
  val FRAME_BYTES = 256

  /** Synthesize a media table from `documents` (deterministic: the text
    * bytes stand in for the blob; kind cycles by doc_id). Stand-in for
    * `spark.read.format("binaryFile")` over an object store.
    */
  def fakeMediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(lit(KINDS.toArray), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height")).as("meta"))

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class MediaFrame(media_id: Long, kind: String, frame_idx: Int, frame_bytes: Array[Byte])

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** STUB DECODER: a real implementation hands `bytes` to a codec and a
    * vision/audio model per partition; this fake derives FEATURE_DIM
    * values deterministically so specs — and the DuckDB oracle — can
    * assert exact pipeline behavior end-to-end. Feature i is the first
    * 16 bits of md5(bytes || ":" || i), which SQL rebuilds as
    * ('0x' || substr(md5(text || ':' || i), 1, 4))::UBIGINT — the same
    * md5-derivation trick that makes the simhash signature oracle-able
    * (see [[graft.functions.TextKernels.simhash64]]). Values are
    * integers ≤ 65535, exactly representable as Float, so the
    * downstream milli-unit quantization stays integer-exact.
    *
    * The blob is digested ONCE: md5 over `bytes` is absorbed into a
    * base digest, which is then `clone()`d per dimension and fed only
    * the tiny ":i" suffix. Cloning copies the 16-byte chain state plus
    * at most 63 buffered bytes, so per-dim cost is O(1) regardless of
    * blob size — versus the 64 full passes this replaced, which were
    * O(FEATURE_DIM × n_bytes) and contradicted the file's own scale
    * notes for MB-sized blobs. The result is bit-identical to
    * md5(bytes || ":" || i) (a clone continues the same byte stream),
    * so the DuckDB oracle rebuild is unchanged.
    */
  private[multimodal] def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val base = md5Digest.get()
    base.reset()
    base.update(bytes)
    val out = new Array[Float](FEATURE_DIM)
    var i = 0
    while (i < FEATURE_DIM) {
      val d = base.clone().asInstanceOf[java.security.MessageDigest]
      d.update((":" + i).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val h = d.digest()
      out(i) = (((h(0) & 0xff) << 8) | (h(1) & 0xff)).toFloat
      i += 1
    }
    out
  }

  /** Feature extraction: binary → fixed-dim float vector, one model
    * session per partition (the expensive init happens once per
    * iterator, not per row — the mapInPandas batch contract).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[MediaRow]
      .mapPartitions { rows =>
        // real impl: val session = loadModel() — once per partition
        rows.map(r => MediaFeatures(r.media_id, r.kind, fakeDecodeFeatures(r.bytes)))
      }
  }

  /** Frame sampling: one blob → many fixed-size frame rows. STUB: frames
    * are FRAME_BYTES-sized chunks; a real impl seeks keyframes. The
    * explode keeps frames narrow so downstream shuffles never carry the
    * full blob.
    */
  def sampleFrames(media: DataFrame): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[MediaRow]
      .flatMap { r =>
        r.bytes.grouped(FRAME_BYTES).zipWithIndex.map {
          case (chunk, i) => MediaFrame(r.media_id, r.kind, i, chunk)
        }
      }
  }

  /** pHash-style 64-bit PERCEPTUAL signature per blob, represented as
    * FOUR 16-bit band values (`b0..b3` = bits [16k, 16k+16) of the
    * signature) — the pigeonhole form the near-dup join blocks on.
    * STUB perception: the "perceptual features" are the blob's
    * FRAME_BYTES-chunks, each hashed to 64 md5-derived bits; signature
    * bit b is the MAJORITY VOTE of bit b across the blob's chunks (the
    * SimHash construction over frames — blobs sharing most frames get
    * hamming-close signatures; cf. the token-level contract of
    * [[graft.functions.TextKernels]] simhash64). A real impl swaps the
    * chunk hash for a DCT low-frequency sign vector per keyframe; the
    * vote, the band split, and the join are unchanged. md5 derivation
    * keeps the signature rebuildable in SQL (the [[fakeDecodeFeatures]]
    * oracle trick): band k's 16 chunk bits are hex chars [4k+1, 4k+4]
    * of md5(chunk).
    *
    * Scale: one narrow projection (the blob never leaves the scan),
    * one 64-aggregate groupBy per blob — corpus-linear, and the output
    * is 4 small ints per blob.
    */
  def phashBands(media: DataFrame): DataFrame = {
    val frames = sampleFrames(media).toDF()
    val h = md5(col("frame_bytes"))
    val hk = (0 until 4).map(k =>
      conv(substring(h, 4 * k + 1, 4), 16, 10).cast("long").as(s"h$k"))
    val withH = frames.select(col("media_id") +: col("kind") +: hk: _*)
    // Majority vote, one SUM aggregate per signature bit (64 codegen'd
    // aggregates, one pass — no per-bit explode). Tie (sum 0) votes 0.
    val votes = for { k <- 0 until 4; b <- 0 until 16 } yield
      sum(when(shiftright(col(s"h$k"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v_${k}_$b")
    val voted = withH.groupBy(col("media_id"), col("kind"))
      .agg(votes.head, votes.tail: _*)
    val bands = (0 until 4).map { k =>
      (0 until 16).map(b =>
        when(col(s"v_${k}_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"b$k")
    }
    voted.select(col("media_id") +: col("kind") +: bands: _*)
  }

  /** Near-dup pairs over [[phashBands]] signatures at hamming ≤ 3,
    * via the 16-bit pigeonhole banded equi-join — EXACT blocking for
    * d ≤ 3 (3 flipped bits leave ≥ 1 of 4 bands untouched), the same
    * shape as the text SimHash join. Pairs are same-kind (an image
    * signature is not comparable to an audio one) and BIDIRECTIONAL
    * (each member of a dup group lists its partners), so a per-media
    * rollup sees every duplicate.
    */
  private def explodedBands(sigs: DataFrame): DataFrame =
    sigs.select(
      col("media_id") +: col("kind") +:
        (0 until 4).map(k => col(s"b$k")) :+
        posexplode(array((0 until 4).map(k => col(s"b$k")): _*))
          .as(Seq("band", "bv")): _*)

  private def bandHamming = (0 until 4)
    .map(k => bit_count(col(s"x.b$k").bitwiseXOR(col(s"y.b$k"))).cast("long"))
    .reduce(_ + _)

  /** Directional near-dup probe: each DELTA signature against the
    * BASE signature index at hamming ≤ 3 — the same pigeonhole
    * blocking as [[phashDupPairs]], but candidate generation is
    * deltaBands ⋈ baseBands only, so cost tracks the arrival batch
    * (the media twin of the incremental-LSH delta probe).
    */
  def phashProbePairs(delta: DataFrame, base: DataFrame): DataFrame =
    explodedBands(delta).as("x").join(explodedBands(base).as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.kind") === col("y.kind") &&
          col("x.media_id") =!= col("y.media_id"))
      .select(col("x.kind").as("kind"), col("x.media_id").as("arrival_id"),
        col("y.media_id").as("base_id"), bandHamming.as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()

  def phashDupPairs(sigs: DataFrame): DataFrame = {
    val ex = explodedBands(sigs)
    val hamming = bandHamming
    ex.as("x").join(ex.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.kind") === col("y.kind") &&
          col("x.media_id") =!= col("y.media_id"))
      .select(col("x.kind").as("kind"), col("x.media_id").as("media_a"),
        col("y.media_id").as("media_b"), hamming.as("hamming"))
      // Filter BEFORE distinct: only d ≤ 3 pairs enter the dedup
      // shuffle instead of every same-band collision.
      .filter(col("hamming") <= 3)
      .distinct()
  }

  /** Resize: bytes → bytes with updated metadata. STUB: truncate/pad to
    * the target byte budget (a real impl rescales pixels); metadata
    * rewrite is the real contract.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val budget = width * height / 256 + 1
    val resized = media.select("media_id", "kind", "bytes").as[MediaRow]
      .map { r =>
        val b = java.util.Arrays.copyOf(r.bytes, budget)
        MediaRow(r.media_id, r.kind, b)
      }
      .toDF("media_id", "kind", "bytes")
    resized.withColumn("meta", struct(
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      lit(width).as("width"), lit(height).as("height")))
  }
}
