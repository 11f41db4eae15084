package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for expensive build artifacts (verified
  * near-dup pairs, component labels, trained IVF index). Entries are
  * keyed by (session, data dir) and assume the dir is immutable while
  * cached — the same contract a persisted index makes.
  *
  * Unlike a bare ConcurrentHashMap, entries do not outlive the session
  * that built them: the first insert for a session registers a
  * SparkListener that drops all of that session's entries when its
  * SparkContext stops, so eagerly checkpointed DataFrames and the
  * stopped session itself are not pinned for the JVM lifetime.
  * Dropped checkpoint blocks are then reclaimed by Spark's
  * ContextCleaner (or die with the context). `clear()` is the manual
  * hook for long-lived JVMs that rewrite a cached dir mid-session.
  */
final class SessionCache[V] {
  private val map = new ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute(s: SparkSession, key: String)(build: => V): V = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          map.keySet.removeIf(_._1 eq s)
          hooked.remove(s)
        }
      })
    }
    map.computeIfAbsent((s, key), _ => build)
  }

  def size: Int = map.size

  def clear(): Unit = map.clear()
}
