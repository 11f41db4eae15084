package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: print the formatted physical plan and timed noop-write
  * for one or more queries. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      // Time construction + materialization: queries with an eager
      // driver loop (connected components) do real work at construction.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name noop-write took ${(System.nanoTime() - t0) / 1e9}%.2fs")
      df.explain("formatted")
    }
    spark.stop()
  }
}
