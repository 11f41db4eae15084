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

/** Same-shim access to Spark's own V2→V1 predicate conversion
  * (`PredicateUtils` is `private[sql]`): the store scan's runtime
  * join-key filters arrive as V2 [[filter.Predicate]]s and the
  * manifest-prune code speaks V1 [[org.apache.spark.sql.sources.Filter]].
  * Predicates Spark cannot convert are dropped — pruning with a subset
  * of conjuncts is always sound.
  */
object V2FilterBridge {
  def toV1(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    predicates.flatMap(p =>
      org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p))

  /** Test-side constructor for INTERNAL-value V2 literals (the form
    * runtime predicates actually carry — e.g. UTF8String for strings;
    * `LiteralValue` itself is `private[sql]`).
    */
  def literal(value: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[_] =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dt)
}
