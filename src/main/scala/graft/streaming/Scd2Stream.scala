package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD Type 2 dimension maintenance as a STREAMING stateful operator:
  * the change-feed stream (one CDC post-image per key change, stamped
  * with its commit version) is folded into validity intervals
  * incrementally, instead of re-running the batch `lead` window over
  * the whole retained feed after every commit.
  *
  * State per natural key = the single OPEN interval (id, change type,
  * valid_from) — constant-size, partitioned by the grouping key, so at
  * 100 TB it scales with LIVE KEY CARDINALITY (executors × state
  * store), not with change volume; a production deployment backs it
  * with the RocksDB state store provider. Each incoming change emits
  * the predecessor interval CLOSED (valid_to = the new change's commit
  * version) plus the new interval as an open CANDIDATE (valid_to
  * NULL); a candidate superseded later is identified downstream by its
  * (email, valid_from) appearing as a closed row — the final current
  * set is candidates ANTI-JOINed against closed rows, a cheap batch
  * finish over the sink. Emissions are append-only and deterministic,
  * so an exactly-once sink (parquet + checkpoint) makes the dimension
  * exactly-once across restarts — the open-interval state itself rides
  * the checkpoint.
  *
  * Batch twin: the `lead`-window derivation in
  * `queries/PipelineParity.pipeline_scd2_history` — both faces are
  * pinned to the same DuckDB oracle by `streaming_scd2_parity`.
  */
object Scd2Stream {

  case class Change(email: String, id: Long, change_type: String,
      commit_version: Long)
  case class OpenInterval(id: Long, change_type: String, valid_from: Long)
  case class IntervalOut(email: String, id: Long, change_type: String,
      valid_from: Long, valid_to: Option[Long])

  /** Fold a (possibly streaming) change-feed frame — post-images and
    * `_pre` images, `(email, id, change_type, commit_version)` — into
    * SCD2 interval emissions. `_pre` images are dropped (the post-image
    * carries the row; matches the batch twin's filter). Rows for one
    * key within a micro-batch are folded in commit-version order; the
    * CDC source's offsets ARE commit versions, so cross-batch order is
    * the log order by construction.
    */
  def scd2(changes: DataFrame): Dataset[IntervalOut] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .filter(!col("change_type").endsWith("_pre"))
      .select(col("email"), col("id"), col("change_type"),
        col("commit_version"))
      .as[Change]
      .groupByKey(_.email)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (email: String, rows: Iterator[Change],
         state: GroupState[OpenInterval]) =>
          val sorted = rows.toIndexedSeq.sortBy(_.commit_version)
          var open = state.getOption
          val out = Seq.newBuilder[IntervalOut]
          sorted.foreach { c =>
            open.foreach { o =>
              out += IntervalOut(email, o.id, o.change_type, o.valid_from,
                Some(c.commit_version))
            }
            out += IntervalOut(email, c.id, c.change_type,
              c.commit_version, None)
            open = Some(OpenInterval(c.id, c.change_type, c.commit_version))
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }
}
