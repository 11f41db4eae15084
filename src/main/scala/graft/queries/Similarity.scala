package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryGroup, Tables}
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * `sim_topk_bruteforce` is the exact baseline: broadcast the (small)
  * query set against the full collection — at 100 TB the collection side
  * stays partitioned, queries broadcast, and the per-partition top-k is
  * combined by the window, so no full shuffle of the collection ever
  * happens (Catalyst turns filter+window-rank into partial top-k).
  *
  * `sim_lsh_ann` is the scale path: random-hyperplane signatures put
  * vectors into 2^16-bucket space; probing a query's own bucket plus all
  * 1-bit-flip neighbors (17 buckets) turns ANN into an equi-join on
  * bucket id. Recall vs the brute-force baseline is asserted in
  * ScalaTest rather than a SQL oracle (the bucketing has no DuckDB
  * equivalent).
  *
  * All cosine math uses the quantized-integer scheme from
  * [[graft.functions.VectorFunctions]] so results hash-match DuckDB.
  */
object Similarity extends QueryGroup {

  private val TOP_K = 5
  // 8 hyperplanes → 256 buckets: sized so buckets hold a handful of
  // vectors at sf0.01 and ~20 at sf0.1; finer buckets (16 planes) left
  // almost every vector alone and recall collapsed.
  private val N_PLANES = 8

  /** Deterministic pseudo-random hyperplanes (fixed seed): N_PLANES × 64
    * integer milli-unit components, materialized as literal arrays so the
    * signature is pure column math (no UDF, no driver state).
    */
  private[queries] val hyperplanes: Array[Array[Long]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(N_PLANES)(Array.fill(64)((rnd.nextDouble() * 2000 - 1000).toLong))
  }

  /** 16-bit bucket id: bit i = sign of <qv, plane_i>. */
  private[queries] def bucketOf(qv: Column): Column =
    hyperplanes.zipWithIndex.map { case (p, i) =>
      when(qdot(qv, lit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qv"))
      .withColumn("sq", qnormSq(col("qv")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-k: every 100th vector queries the full collection.
    "sim_topk_bruteforce" -> ((s, dir) => {
      val all = quantized(s, dir)
      val q = all.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("sq").as("q_sq"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_ppm").desc, col("neighbor_id"))
      all.select(col("vec_id").as("neighbor_id"), col("qv"), col("sq"))
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_ppm", cosPpm(qdot(col("q_qv"), col("qv")), col("q_sq"), col("sq")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TOP_K)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_ppm"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN: same query set, candidates = own bucket ∪ 1-bit
    // probes. Equi-join on bucket id — shuffle-partitionable at any scale.
    "sim_lsh_ann" -> ((s, dir) => {
      val all = quantized(s, dir).withColumn("bucket", bucketOf(col("qv")))
      // Multiprobe: own bucket + every 1-bit and 2-bit flip (37 probes)
      // — the standard recall/candidate-count dial for hyperplane LSH.
      val flips1 = (0 until N_PLANES).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      val flips2 = for {
        i <- 0 until N_PLANES; j <- (i + 1) until N_PLANES
      } yield col("bucket").bitwiseXOR(lit((1L << i) | (1L << j)))
      val probes = array(col("bucket") +: (flips1 ++ flips2): _*)
      val q = all.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("sq").as("q_sq"),
          explode(probes).as("probe"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_ppm").desc, col("neighbor_id"))
      all.select(col("vec_id").as("neighbor_id"), col("qv"), col("sq"), col("bucket"))
        .join(q, col("probe") === col("bucket") && col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_ppm", cosPpm(qdot(col("q_qv"), col("qv")), col("q_sq"), col("sq")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TOP_K)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_ppm"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Nearest-centroid classification: per-label element-wise sum vector
    // (exact integers; cosine is scale-invariant so the un-normalized sum
    // IS the centroid), then argmax over broadcast centroids.
    "sim_centroid_classify" -> ((s, dir) => {
      val all = quantized(s, dir)
      val centroids = all
        .select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("v")).as("sv"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("sv")))).as("ps"))
        .select(col("label").as("c_label"), transform(col("ps"), p => p("sv")).as("cv"))
        .withColumn("c_sq", qnormSq(col("cv")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_ppm").desc, col("c_label"))
      all.join(broadcast(centroids))
        .withColumn("cos_ppm", cosPpm(qdot(col("qv"), col("cv")), col("sq"), col("c_sq")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          count(when(col("c_label") === col("label"), 1)).as("n_correct"))
        .orderBy(col("label"))
    }))

  private val quantSql =
    """q AS (SELECT vec_id, label,
         [CAST(floor(CAST(x AS DOUBLE)*1000.0) AS BIGINT) for x in embedding] AS qv
       FROM embeddings),
       n AS (SELECT vec_id, label, qv, CAST(list_sum([x*x for x in qv]) AS BIGINT) AS sq FROM q)"""

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""WITH $quantSql,
          p AS (SELECT qq.vec_id AS query_id, nn.vec_id AS neighbor_id,
                  CAST(floor(CAST(CAST(list_sum([qq.qv[i]*nn.qv[i] for i in range(1, len(qq.qv)+1)]) AS BIGINT) AS DOUBLE)
                    * 1000000.0 / (sqrt(CAST(qq.sq AS DOUBLE))*sqrt(CAST(nn.sq AS DOUBLE)))) AS BIGINT) AS cos_ppm
                FROM n qq JOIN n nn ON qq.vec_id % 100 = 0 AND nn.vec_id <> qq.vec_id),
          r AS (SELECT query_id, neighbor_id, cos_ppm,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_ppm DESC, neighbor_id) AS BIGINT) AS rank
                FROM p)
          SELECT query_id, rank, neighbor_id, cos_ppm FROM r
          WHERE rank <= $TOP_K ORDER BY query_id, rank""",
    "sim_centroid_classify" ->
      s"""WITH $quantSql,
          ex AS (SELECT label, i AS pos, qv[i] AS v
                 FROM n, range(1, 65) t(i)),
          cs AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS sv FROM ex GROUP BY 1, 2),
          cent AS (SELECT label AS c_label, list(sv ORDER BY pos) AS cv FROM cs GROUP BY 1),
          cn AS (SELECT c_label, cv, CAST(list_sum([x*x for x in cv]) AS BIGINT) AS c_sq FROM cent),
          scored AS (SELECT n.vec_id, n.label, cn.c_label,
                  CAST(floor(CAST(CAST(list_sum([n.qv[i]*cn.cv[i] for i in range(1, len(n.qv)+1)]) AS BIGINT) AS DOUBLE)
                    * 1000000.0 / (sqrt(CAST(n.sq AS DOUBLE))*sqrt(CAST(cn.c_sq AS DOUBLE)))) AS BIGINT) AS cos_ppm
                FROM n, cn),
          best AS (SELECT vec_id, label, c_label,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_ppm DESC, c_label) AS rn
                FROM scored)
          SELECT label, COUNT(*) AS n_vecs,
            COUNT(*) FILTER (c_label = label) AS n_correct
          FROM best WHERE rn = 1 GROUP BY label ORDER BY label""")
}
