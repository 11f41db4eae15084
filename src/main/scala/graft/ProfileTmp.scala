package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not committed): times individual store ops. */
object ProfileTmp {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime()-t0)/1e9}%6.2fs"); r
    }
    val base = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"),
        concat(lit("f"), col("c_custkey")).as("first_name"),
        concat(lit("l"), col("c_custkey")).as("last_name"),
        concat(lit("u"), col("c_custkey"), lit("@example.com")).as("email"),
        concat(lit("555-"), col("c_custkey")).as("phone"))
    t("warmup count")(base.count())
    @volatile var jobs = 0
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != 0L) println(f"[prof]   job ${je.jobId}%3d ${(System.nanoTime()-s)/1e9}%5.2fs")
      }
    })
    for (round <- 1 to 2) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-prof-").toString
      val store = new graft.pipeline.CustomerStore(spark, s"$tmp/store")
      t(s"r$round insertNew(full)")(store.insertNew(pipeline.Ingest.enrich(base)))
      t(s"r$round insertNew(slice)")(store.insertNew(pipeline.Ingest.enrich(
        base.filter(col("id") % 3 === 0).withColumn("id", col("id") + 50000000L)
          .withColumn("email", concat(lit("w"), col("id"), lit("@x.com"))))))
      t(s"r$round delete(1/7)")(store.delete(
        base.filter(col("id") % 7 === 0).select(col("email"))))
      t(s"r$round all.count")(store.all().count())
      t(s"r$round asOf(1).count")(store.asOf(1).count())
      t(s"r$round changeFeed agg")(store.changeFeed()
        .agg(count(lit(1))).head())
      t(s"r$round compact")(store.compact())
      t(s"r$round clone-dir")(graft.util.Fs.deleteRecursively(
        java.nio.file.Paths.get(tmp)))
    }
    spark.stop()
  }
}
