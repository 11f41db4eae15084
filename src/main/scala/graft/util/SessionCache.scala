package graft.util

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo cache for expensive build artifacts (verified
  * near-dup pairs, component labels, trained IVF index). Entries are
  * keyed by (session, data dir) and assume the dir is immutable while
  * cached — the same contract a persisted index makes.
  *
  * Unlike a bare ConcurrentHashMap, entries do not outlive the
  * SparkContext that built them: the first insert against a context
  * registers ONE listener (per cache instance) that drops every entry
  * of every session sharing that context when it stops, so eagerly
  * checkpointed DataFrames and stopped sessions are not pinned for the
  * JVM lifetime. Checkpoint blocks die with the context. Caveat: a
  * `newSession()` child discarded while its context lives is held
  * until the context stops — per-session end has no Spark event; a
  * harness cycling many child sessions over one context should call
  * `clear()` (or [[SessionCache.clearAll]]) between runs, which is
  * also the hook for rewriting a cached dir mid-session.
  */
final class SessionCache[V] {
  private val map = new ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkContext]()

  SessionCache.register(this)

  def getOrCompute(s: SparkSession, key: String)(build: => V): V = {
    val sc = s.sparkContext
    if (!sc.isStopped && hooked.add(sc)) {
      try sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          map.keySet.removeIf(_._1.sparkContext eq sc)
          hooked.remove(sc)
        }
      }) catch {
        // Context stopped between the check and the registration: no
        // eviction needed (nothing new can be cached against it that
        // outlives anything), and the lookup below must still work.
        case _: IllegalStateException => hooked.remove(sc)
      }
    }
    map.computeIfAbsent((s, key), _ => build)
  }

  def size: Int = map.size

  def clear(): Unit = map.clear()
}

object SessionCache {
  // Cache instances are object-level singletons (a handful per JVM),
  // so this registry is bounded by the number of caching modules.
  private val instances =
    new java.util.concurrent.ConcurrentLinkedQueue[SessionCache[_]]()

  private def register(c: SessionCache[_]): Unit = instances.add(c)

  /** Drop every entry in every cache instance — the one-call
    * invalidation hook for long-lived JVMs that rewrite a cached data
    * dir (per-module `clearCaches()` hooks cover the targeted case).
    */
  def clearAll(): Unit = instances.forEach(_.clear())
}
