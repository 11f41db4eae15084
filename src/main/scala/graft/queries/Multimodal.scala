package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryGroup
import graft.multimodal.MediaOps
import graft.functions.VectorFunctions._

/** Multimodal plumbing exercised as driver-checkable queries. The blob
  * content is a deterministic stand-in (see MediaOps), so the
  * byte-count/metadata/frame arithmetic is fully oracle-able; the
  * feature-kNN query is rows-only (stub features have no SQL twin).
  */
object Multimodal extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata profile over binary columns: group on kind, never
    // touching the blob in the shuffle (only byte lengths travel).
    "media_meta_profile" -> ((s, dir) => {
      MediaOps.fakeMediaTable(s, dir)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("meta.n_bytes")).as("sum_bytes"),
          max(col("meta.n_bytes")).as("max_bytes"))
        .orderBy(col("kind"))
    }),

    // Frame sampling fan-out: blob → FRAME_BYTES-chunk frames; counts
    // verify the explode arithmetic.
    "media_frame_counts" -> ((s, dir) => {
      val frames = MediaOps.sampleFrames(MediaOps.fakeMediaTable(s, dir))
      frames.groupBy(col("kind"))
        .agg(
          countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("kind"))
    }),

    // Feature-space kNN: extract (stub) features, then top-3 neighbors
    // per image among images — binary → vector → ANN integration.
    // Rows-only: the stub decoder has no SQL equivalent.
    "media_feature_knn" -> ((s, dir) => {
      // Repartition to cores before the per-byte feature kernel: the
      // scan is one row group, the decode pass is the cost (a real
      // model/codec even more so) — the mapInPandas-style "spread the
      // decode, then keep rows narrow" shape.
      val feats = MediaOps.extractFeatures(
          MediaOps.fakeMediaTable(s, dir).filter(col("kind") === "image")
            .repartition(s.sparkContext.defaultParallelism))
        .toDF()
        .select(col("media_id"), quantize(col("features")).as("qv"))
        .withColumn("sq", qnormSq(col("qv")))
      val q = feats.filter(col("media_id") % 30 === 0)
        .select(col("media_id").as("query_id"), col("qv").as("q_qv"), col("sq").as("q_sq"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_ppm").desc, col("neighbor_id"))
      feats.select(col("media_id").as("neighbor_id"), col("qv"), col("sq"))
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_ppm", cosPpm(qdot(col("q_qv"), col("qv")), col("q_sq"), col("sq")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_ppm"))
        .orderBy(col("query_id"), col("rank"))
    }))

  val oracles: Map[String, String] = Map(
    "media_meta_profile" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_items,
         CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
         CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
         FROM documents GROUP BY 1 ORDER BY kind""",
    "media_frame_counts" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_media,
         CAST(SUM((strlen(text) + 255) // 256) AS BIGINT) AS n_frames
         FROM documents GROUP BY 1 ORDER BY kind""")
}
