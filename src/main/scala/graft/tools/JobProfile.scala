package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement harness for the optimization rounds (guide §1): runs the
  * named queries (SPARK_GRAFT_PROFILE_ONLY, comma-separated; default a
  * representative pipeline-family set) through the same noop sink as the
  * bench, with a SparkListener recording every Spark JOB (id, description,
  * wall ms). Prints a per-query job histogram so "how many jobs does a
  * store commit cost" is a measured number, not a guess.
  *
  * Dev-time only: never run by the driver, reads the same
  * SPARK_GRAFT_SF_DIR/CPUS contract as the bench.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.add((je.jobId, desc, je.time - t0))
        }
      }
    })

    val defaults = Seq("pipeline_catalog_write", "pipeline_restore",
      "pipeline_merge_upsert", "pipeline_workqueue_cycle",
      "pipeline_delete_vectors", "pipeline_purge_erasure")
    val names = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(defaults)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "2").toInt

    // Prebuild templates so gate numbers are operator cost, as in the bench.
    try graft.queries.PipelineParity.prebuildTemplates(
      spark, sfDir, Long.MaxValue)
    catch { case e: Throwable => System.err.println(s"[profile] prebuild: $e") }

    for (p <- 1 to passes; name <- names) {
      graft.util.SessionCache.clearAll()
      graft.util.IndexStore.invalidate(sfDir)
      done.clear()
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // Let straggler listener events land.
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val byDesc = done.asScala.toSeq.groupBy(_._2)
        .map { case (d, js) => (d, js.size, js.map(_._3).sum) }
        .toSeq.sortBy(-_._3)
      println(f"== p$p $name%-28s ${sec}%7.2f s  jobs=${done.size}%3d  jobms=${done.asScala.map(_._3).sum}%5d")
      byDesc.take(20).foreach { case (d, n, ms) =>
        val label = if (d.isEmpty) "(unlabeled)" else d.take(70)
        println(f"     $n%3d jobs $ms%6d ms  $label")
      }
      if (sys.env.contains("SPARK_GRAFT_PROFILE_VERBOSE"))
        done.asScala.toSeq.sortBy(-_._3).take(25).foreach { case (id, d, ms) =>
          println(f"       job $id%4d $ms%6d ms  ${if (d.isEmpty) "(unlabeled)" else d.take(60)}")
        }
    }
    spark.stop()
  }
}
