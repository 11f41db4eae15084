package graft.tools

/** Dev tool: print the driver-facing query inventory (count + any
  * queries lacking a DuckDB oracle). */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"queries=${q.size} oracles=${o.size}")
    val missing = q.keySet -- o.keySet
    println(s"no-oracle=${missing.toSeq.sorted.mkString(",")}")
    val orphan = o.keySet -- q.keySet
    println(s"orphan-oracle=${orphan.toSeq.sorted.mkString(",")}")
  }
}
