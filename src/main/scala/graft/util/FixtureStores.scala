package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** JVM-wide registry of parity-gate FIXTURE STORE templates.
  *
  * The pipeline/streaming parity gates exercise store lifecycle
  * operators (delete vectors, OPTIMIZE, time travel, CDC resume, …)
  * against multi-commit CustomerStore fixtures. Building such a
  * fixture costs seconds of commit machinery per gate; the fixture is
  * SCAFFOLDING, not the operator under test — so each distinct
  * (shape, table dir) template is built exactly once per JVM and then
  * either read in place (read-only gates) or cloned with a plain
  * recursive file copy (~10 ms) by gates that mutate.
  *
  * Deliberately NOT a [[SessionCache]]: the bench evicts SessionCache
  * between passes so memoized OPERATOR builds (index training,
  * verified-pairs) re-pay their cost into the measured minimum —
  * fixture construction must NOT ride that policy, it would charge
  * test scaffolding to the operator's number (round-11 verdict: ~47%
  * of a bench pass was fixture construction). The cached value is a
  * directory of parquet/manifest files, valid for any SparkSession in
  * the JVM; a shutdown hook sweeps the temp dirs.
  */
object FixtureStores {

  private val templates = new ConcurrentHashMap[String, String]()

  private lazy val sweepHook: Unit =
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
      templates.values().forEach { d =>
        try Fs.deleteRecursively(Paths.get(d))
        catch { case _: Throwable => () }
      }))

  /** The template directory for `key` (callers key by shape + table
    * dir + any fixture constants), built on first use by `build`
    * receiving a fresh temp directory whose `store` subdirectory is
    * the conventional store path. Returns the STORE path.
    *
    * `build` runs OUTSIDE the map's locks (get → build → putIfAbsent,
    * never computeIfAbsent): a template builder may therefore resolve
    * another template — a nested computeIfAbsent would throw
    * "Recursive update" whenever the two keys hash to the same bin.
    * Two threads racing the same cold key may both build; the loser's
    * directory is swept and the winner's is returned, which is safe
    * because builders write only into their fresh temp dir.
    */
  def template(key: String)(build: String => Unit): String = {
    sweepHook
    val existing = templates.get(key)
    val root =
      if (existing != null) existing
      else {
        val tmp = Files.createTempDirectory("graft-fixture-").toString
        build(s"$tmp/store")
        val prior = templates.putIfAbsent(key, tmp)
        if (prior != null) {
          try Fs.deleteRecursively(Paths.get(tmp))
          catch { case _: Throwable => () }
          prior
        } else tmp
      }
    root + "/store"
  }

  /** Recursive file copy of a template store into a fresh directory
    * under `destRoot` — the mutable working copy for gates that write.
    * Hard-links would be unsafe (compaction deletes files in place).
    */
  def cloneInto(templateStorePath: String, destRoot: Path): String = {
    val src = Paths.get(templateStorePath)
    val dst = destRoot.resolve("store")
    val walk = Files.walk(src)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      }
    } finally walk.close()
    dst.toString
  }

  /** Test hook: drop every template (and its files) so a spec can
    * exercise the build path itself.
    */
  def reset(): Unit = {
    val it = templates.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); it.remove()
      try Fs.deleteRecursively(Paths.get(e.getValue))
      catch { case _: Throwable => () }
    }
  }
}
