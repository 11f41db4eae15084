package graft.streaming

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming KMV sketch across REAL micro-batch boundaries: the
  * parity gate (streaming_kmv_parity) drains the events table in one
  * AvailableNow batch, so this spec is the half that forces state to
  * SURVIVE batches — one file per trigger, the TopKAggregator buffer
  * living in the state store between them — and then checks the
  * merged per-shard sketches equal the batch bottom-k exactly (the
  * aggregator's merge law IS the KMV merge, so crossing a batch
  * boundary must be invisible in the final state).
  */
class KmvStreamSpec extends SparkSpec {

  test("bottom-k state survives micro-batch boundaries and merges exactly") {
    import spark.implicits._
    val in = tmpDir("kmv-in")
    val out = tmpDir("kmv-out")
    val ckpt = tmpDir("kmv-ckpt")
    val K = 32
    (0 until 4).foreach { f =>
      val stage = s"$in/stage$f"
      (0 until 100).map(i => (f * 100 + i + 1).toLong).toDF("event_id")
        .coalesce(1).write.parquet(stage)
      val part = new File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new File(in, s"f$f.parquet")))
      graft.util.Fs.deleteRecursively(new File(stage).toPath)
    }
    def hOf = conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val topk = new graft.functions.TopKAggregator(K).toColumn
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.readStream
      .schema(StructType(Seq(StructField("event_id", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*.parquet")
      .select(pmod(col("event_id"), lit(4L)).as("shard"),
        (-hOf).as("negh"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("sk"))
      .toDF("shard", "sk")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.incrementAndGet(); b.write.mode("append").parquet(out); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    assert(batches.get() >= 4, s"expected >=4 micro-batches, saw ${batches.get()}")
    val merged = spark.read.schema(StructType(Seq(
        StructField("shard", LongType),
        StructField("sk", ArrayType(StructType(Seq(
          StructField("_1", LongType), StructField("_2", LongType))))))))
      .parquet(out)
      .select(explode(col("sk")).as("p"))
      .select((-col("p._1")).as("h"), col("p._2").as("id"))
      .distinct()
      .orderBy(col("h"), col("id")).limit(K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = (1 to 400).map(_.toLong).toDF("event_id")
      .select(hOf.as("h"), col("event_id"))
      .orderBy(col("h"), col("event_id")).limit(K)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged === batch, "streamed sketch diverged from the batch bottom-k")
  }
}
