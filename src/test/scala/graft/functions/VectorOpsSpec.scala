package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** The broadcast-matrix sweep must emit exactly what the declarative
  * column-math formulation emits — same pairs, same integer cosines.
  */
class VectorOpsSpec extends SparkSpec {

  test("exactCosinePairs equals the join+column formulation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("sq", qnormSq(col("qv")))
    val sweep = VectorOps.exactCosinePairs(df, 100000L).collect()
      .map(p => (p.vec_a, p.vec_b, p.cos_ppm)).sorted
    val a = df.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("sq").as("sa"))
    val b = df.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("sq").as("sb"))
    val joined = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_ppm", cosPpm(qdot(col("qa"), col("qb")), col("sa"), col("sb")))
      .filter(col("cos_ppm") >= 100000L)
      .select("vec_a", "vec_b", "cos_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(sweep.nonEmpty, "threshold produced no pairs — test vacuous")
    assert(sweep.toSeq === joined.toSeq)
    // Tiled sweeps (beyond-memory path) must partition the pair space
    // exactly — same result for any tile size, including one that does
    // not divide the collection evenly.
    val tiled = VectorOps.exactCosinePairsTiled(df, 100000L, tile = 16).collect()
      .map(p => (p.vec_a, p.vec_b, p.cos_ppm)).sorted
    assert(tiled.toSeq === sweep.toSeq)
    val tiledUneven = VectorOps.exactCosinePairsTiled(df, 100000L, tile = 7).collect()
      .map(p => (p.vec_a, p.vec_b, p.cos_ppm)).sorted
    assert(tiledUneven.toSeq === sweep.toSeq)
  }

  test("tiled sweep handles sparse non-contiguous vec_ids") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ids with gaps and uneven spacing — block bounds must come from the
    // actual ids, not assumed-dense ranges.
    val ids = Seq(3L, 10L, 11L, 57L, 100L, 101L, 102L, 999L, 5000L, 5001L,
      7777L, 8000L, 8001L, 8002L, 9999L)
    val vecs = ids.map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("sq", qnormSq(col("qv")))
    val whole = VectorOps.exactCosinePairs(df, -1000000L).collect()
      .map(p => (p.vec_a, p.vec_b, p.cos_ppm)).sorted
    assert(whole.length === ids.length * (ids.length - 1) / 2,
      "threshold -1 must emit every pair exactly once")
    val tiled = VectorOps.exactCosinePairsTiled(df, -1000000L, tile = 4).collect()
      .map(p => (p.vec_a, p.vec_b, p.cos_ppm)).sorted
    assert(tiled.toSeq === whole.toSeq)
  }
}
