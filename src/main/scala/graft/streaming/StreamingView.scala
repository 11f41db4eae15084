package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming MATERIALIZED-VIEW maintenance over a
  * [[graft.pipeline.CustomerStore]] change feed: a checkpointed file
  * stream over the `_changelog` commit-directory glob drives each
  * micro-batch's change rows
  * through the retraction weighting (+1 post-image, −1 `_pre`
  * pre-image) into ONE authoritative aggregate table — the downstream
  * consumer shape the feed's pre-images exist for, kept fresh per
  * commit instead of rescanned.
  *
  * Exactly-once across restarts by construction (the idempotent-sink
  * contract foreachBatch requires):
  *
  *  - the file source's checkpoint delivers each commit's files
  *    at-least-once, tagged with a monotonically increasing batchId;
  *  - the sink applies a batch ONLY if `batchId` exceeds the latest
  *    applied id (recorded in the state directory's file names), and
  *    promotes the new state by staged atomic rename — a batch
  *    redelivered after a crash between rename and checkpoint commit
  *    finds its id already applied and skips, so the view never
  *    double-counts a delta.
  *
  * The maintained view here is the work-queue census (rows and id-sum
  * per uploaded state); the MECHANISM — versioned state files, skip
  * already-applied ids, staged rename — is view-independent and is
  * what a 100 TB deployment reuses with the aggregate swapped out
  * (state stays one row per group; the stream reads only feed deltas).
  */
object StreamingView {

  val stateSchema: StructType = StructType(Seq(
    StructField("uploaded", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("id_sum", LongType, nullable = false)))

  /** Start the AvailableNow maintenance pass: drain whatever feed
    * commits the checkpoint has not yet applied into the state dir.
    */
  def start(spark: SparkSession, feedGlob: String, feedSchema: StructType,
      stateDir: String, checkpoint: String): StreamingQuery =
    spark.readStream.schema(feedSchema).parquet(feedGlob)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(stateDir)(batch, batchId)
      }
      .start()

  /** The materialized view's current contents (empty before the first
    * applied batch).
    */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    latestState(stateDir) match {
      case Some((_, dir)) =>
        spark.read.schema(stateSchema).parquet(dir.toString)
          .select(stateSchema.fieldNames.map(col): _*)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)
    }

  /** Apply one micro-batch of change rows: skip if this batchId is
    * already reflected in the state (redelivery), else fold the
    * weighted delta into the previous state and promote
    * `state-<batchId>` atomically. Public for the crash-replay spec.
    */
  def applyBatch(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val root = new java.io.File(stateDir)
    root.mkdirs()
    val latest = latestState(stateDir)
    if (latest.exists(_._1 >= batchId)) return // already applied — replay no-op
    val spark = batch.sparkSession
    val prev = read(spark, stateDir)
    val delta = batch
      .withColumn("w", when(col("change_type").endsWith("_pre"), -1L).otherwise(1L))
      .groupBy(col("uploaded").cast("long").as("uploaded"))
      .agg(sum(col("w")).as("n"), sum(col("w") * col("id")).as("id_sum"))
    val next = prev.unionByName(delta)
      .groupBy(col("uploaded"))
      .agg(sum(col("n")).as("n"), sum(col("id_sum")).as("id_sum"))
      .filter(col("n") =!= 0)
      .select(stateSchema.fieldNames.map(col): _*)
    val tmp = new java.io.File(root, f".tmp-$batchId%09d")
    if (tmp.exists()) graft.util.Fs.deleteRecursively(tmp.toPath)
    next.write.parquet(tmp.toString)
    val dst = new java.io.File(root, f"state-$batchId%09d")
    require(tmp.renameTo(dst), s"state promotion $tmp -> $dst failed")
    // Retire superseded states (crash-safe: the new state is already
    // promoted; a redelivered batch skips on the id check above).
    stateFiles(stateDir).filter(_._1 < batchId).foreach { case (_, d) =>
      graft.util.Fs.deleteRecursively(d.toPath)
    }
  }

  private def stateFiles(stateDir: String): Seq[(Long, java.io.File)] = {
    val root = new java.io.File(stateDir)
    if (!root.exists()) Seq.empty
    else root.listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("state-"))
      .map(d => d.getName.stripPrefix("state-").toLong -> d)
      .sortBy(_._1)
  }

  private def latestState(stateDir: String): Option[(Long, java.io.File)] =
    stateFiles(stateDir).lastOption
}
