package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped Spark job description (guide §1.5): labels every job an
  * operation submits so the UI / a listener can attribute cost to the
  * phase that paid it, restoring the caller's label on exit. The
  * property is thread-local, so concurrently submitted phases (the
  * staged-commit write chains) each carry their own label.
  */
object Labeled {
  def apply[T](s: SparkSession, desc: String)(op: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try op finally sc.setJobDescription(prev)
  }
}
