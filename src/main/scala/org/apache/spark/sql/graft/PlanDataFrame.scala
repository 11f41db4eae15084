package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** `private[sql]` bridge: turn an analyzed [[LogicalPlan]] back into a
  * [[DataFrame]] from engine code (graft.plans.MergeIntoStoreCommand
  * needs its captured MERGE source plan as a DataFrame at run time).
  * `Dataset.ofRows` is package-private to `org.apache.spark.sql`, so
  * this one-method accessor lives in a subpackage — the standard shim
  * every external connector with command-style DML (Delta Lake's
  * MergeIntoCommand being the canonical example) ships.
  */
object PlanDataFrame {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
