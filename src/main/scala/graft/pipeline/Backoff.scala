package graft.pipeline

/** Fibonacci backoff schedule with reset-on-success — the
  * crmIntegrator's poll cadence (csv-crm-upload
  * crm/upload/uploader.go:71-97,161-170): intervals 1,2,3,5,8,… seconds,
  * snapped back to the start whenever any upload succeeds. Pure
  * driver-side scheduling state; no Spark extension point involved
  * (SURVEY §7.3).
  */
final class Backoff(seedA: Long = 1, seedB: Long = 1, maxInterval: Long = 60) {
  private var a = seedA
  private var b = seedB

  /** Current wait (seconds) and advance the schedule. */
  def nextInterval(): Long = {
    val cur = a
    val n = a + b
    a = b
    b = n
    math.min(cur, maxInterval)
  }

  /** Any upload success resets to the fast end (uploader.go:77-81). */
  def reset(): Unit = { a = seedA; b = seedB }
}

/** Conflating signal — the reference's 1-buffered channel
  * (signal/listener/listener.go:28-35): N notifications while busy
  * collapse into one wakeup; notifications during an empty buffer are
  * dropped, never queued.
  */
final class Signal {
  private val pending = new java.util.concurrent.atomic.AtomicBoolean(false)
  def notifyData(): Unit = pending.set(true)
  def consume(): Boolean = pending.getAndSet(false)
}
