package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.{castToImpl => impl}
import org.apache.spark.sql.execution.LogicalRDD

/** De-stream a V1 `Sink.addBatch` micro-batch DataFrame — the exact
  * conversion Spark's own `ForeachBatchSink` performs before handing
  * the frame to user code: wrap the ALREADY-PLANNED incremental
  * execution's RDD in a batch-flagged `LogicalRDD`, so downstream
  * code may run arbitrary batch operations (joins, checkpoints,
  * writes) without tripping the "streaming sources must be executed
  * with writeStream" analysis check. Lives under
  * `org.apache.spark.sql` (the Delta-style extension package) because
  * `LogicalRDD`/`Dataset.ofRows` are `private[sql]` — this is the
  * blessed extension seam, not an internal fork.
  */
object MicroBatch {
  def asBatch(data: DataFrame): DataFrame = {
    val ds = impl(data)
    val node = LogicalRDD.fromDataset(
      ds.queryExecution.toRdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, node)
  }
}
