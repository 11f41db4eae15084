package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-action multiset equality (r16; guide §1.2 "don't compute things
  * twice"): group the union of `a` weighted +1 and `b` weighted −1 on
  * every column of `a`; every group sum is zero iff `a.exceptAll(b)`
  * AND `b.exceptAll(a)` are both empty (the round-15 lifecycle
  * rebuild-parity pattern, Similarity.scala). The old
  * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` shape ran two
  * jobs, each evaluating BOTH inputs; this evaluates each input once
  * in one job. Null keys group together, exactly as exceptAll compares
  * them.
  */
object MultisetEq {
  def apply(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    a.select(cols.map(col): _*).withColumn("_w", lit(1L))
      .unionByName(b.select(cols.map(col): _*).withColumn("_w", lit(-1L)))
      .groupBy(cols.map(col): _*).agg(sum(col("_w")).as("_s"))
      .filter(col("_s") =!= 0L)
      .isEmpty
  }
}
