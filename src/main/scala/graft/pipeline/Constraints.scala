package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A declarative CHECK constraint enforced at the store's transaction
  * boundary (the Delta-style `ADD CONSTRAINT CHECK` surface).
  */
final case class CheckConstraint(name: String, predicate: Column)

/** CHECK-constraint enforcement for store commits: a batch is split
  * into committing rows and per-constraint rejects BEFORE the staged
  * commit, so a violating row can never be observed in table data —
  * the transactional upgrade of the reference's reader-side row
  * validation (csv-crm-upload validates only in the CSV reader,
  * cmd/csvreader/csvreader.go:38-59; anything that reaches the DB
  * layer is trusted). Violation attribution is deterministic: the
  * FIRST declared constraint a row fails names it, and a NULL
  * predicate result counts as a violation (unknown is not clean) —
  * both choices mirrored textually in the oracle's CASE.
  */
object Constraints {

  /** Tag expression: each row's first violated constraint, null if
    * every check passes.
    */
  def violation(cs: Seq[CheckConstraint]): Column =
    cs.foldRight(lit(null).cast("string")) { (c, acc) =>
      when(!coalesce(c.predicate, lit(false)), lit(c.name)).otherwise(acc)
    }

  /** Split a batch into (valid, rejected): rejected rows carry their
    * reason in `_violation`. One projection each — the enforcement
    * cost is a scan of the batch, never a shuffle.
    */
  def enforce(batch: DataFrame, cs: Seq[CheckConstraint]): (DataFrame, DataFrame) = {
    val tagged = batch.withColumn("_violation", violation(cs))
    (tagged.filter(col("_violation").isNull).drop("_violation"),
      tagged.filter(col("_violation").isNotNull))
  }
}
