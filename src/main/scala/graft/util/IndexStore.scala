package graft.util

import java.io.File
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted build artifacts (verified near-dup pairs, minhash band
  * table, trained IVF index) as parquet under a content-addressed
  * directory — the production contract for expensive index builds:
  * build once, persist, and let every later session LOAD instead of
  * retrain. [[SessionCache]] remains the per-session memo of the
  * *load*, so repeated queries in one session don't even re-open the
  * parquet footer.
  *
  * Addressing: artifacts live at `<root>/<fingerprint(dataDir)>/<name>`
  * where the fingerprint hashes the data dir's path plus every parquet
  * file's (name, size, mtime). Rewriting or regenerating the source
  * data therefore changes the address and orphans the stale index —
  * the load-or-build path rebuilds automatically (and [[gc]]s the
  * orphaned fingerprint dirs of the same data dir, so regeneration
  * doesn't leak storage), and no staleness check is needed at read
  * time for DATA changes. CODE/parameter
  * changes are the caller's half of the contract: every governing
  * constant of a build must be encoded in the artifact `name`
  * (`minhash_bands_n3k128b64`, `ivf_postings_l32r2a2`, `bpe_merges_k8`),
  * so retuning a builder re-addresses its artifacts instead of
  * silently loading a stale model. This is the same validity rule the
  * session memo documents ("dir immutable while cached") made durable.
  *
  * Scale notes: at 100 TB the root moves from local disk to the object
  * store (any Hadoop-FS URI works unchanged) and the fingerprint moves
  * from file mtimes to the table format's snapshot id; the build is
  * written by ONE job and read by every consumer after — exactly the
  * shape here. Writes go through a same-JVM per-path lock plus the
  * `_SUCCESS` marker, so concurrent first-builds in one driver
  * serialize and a torn write is never addressable.
  */
object IndexStore {

  /** Override order: system property (tests), env var, /tmp default. */
  def rootDir: String =
    sys.props.getOrElse("graft.index.dir",
      sys.env.getOrElse("GRAFT_INDEX_DIR", "/tmp/graft-index"))

  private[util] def fingerprint(dir: String): String = {
    // A table is either a bare file (the testdata layout) or a
    // directory of part files (Spark's writer layout) — stat both.
    def stat(f: File): String =
      if (f.isFile) s"${f.getName}:${f.length}:${f.lastModified}"
      else {
        val parts = Option(f.listFiles()).getOrElse(Array.empty[File]).filter(_.isFile)
        val size = parts.map(_.length).sum
        val mtime = if (parts.isEmpty) f.lastModified else parts.map(_.lastModified).max
        s"${f.getName}:$size:$mtime:${parts.length}"
      }
    val entries = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .map(stat)
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update((dir +: entries).mkString("|").getBytes("UTF-8"))
    d.digest().map("%02x".format(_)).mkString
  }

  private def artifactDir(dir: String, name: String): File =
    new File(new File(rootDir, fingerprint(dir)), name)

  private val locks = new ConcurrentHashMap[String, Object]()

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Each fingerprint dir records its source data dir in a `_meta`
    * marker (underscore-prefixed, invisible to Spark discovery), so
    * [[gc]] can tell which stale siblings a regenerated data dir
    * orphaned — the fingerprint alone is one-way.
    */
  private val MetaName = "_meta"

  private def writeMeta(fpDir: File, dir: String): Unit = {
    fpDir.mkdirs()
    val m = new File(fpDir, MetaName)
    if (!m.isFile)
      java.nio.file.Files.write(m.toPath, dir.getBytes("UTF-8")): Unit
  }

  /** Collect fingerprint dirs that belonged to `dir` but no longer
    * match its content — without this, every data regeneration leaks
    * an orphaned index dir forever on a shared store. Runs inside the
    * load-or-build path; the documented session contract (a cached
    * dir's data is immutable while cached) already forbids a reader
    * holding the stale fingerprint concurrently. Returns the number
    * of dirs collected.
    */
  def gc(dir: String, keepFingerprint: String): Int = {
    val stale = Option(new File(rootDir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName != keepFingerprint)
      .filter { f =>
        val m = new File(f, MetaName)
        m.isFile && (try new String(
          java.nio.file.Files.readAllBytes(m.toPath), "UTF-8") == dir
        catch { case _: java.io.IOException => false })
      }
    stale.foreach(deleteRecursively)
    stale.length
  }

  /** Load `names` artifacts for `dir`, or run `build` ONCE to produce
    * all of them and persist each before loading. A build of several
    * coupled artifacts (IVF assignments + centroids) is atomic as a
    * group: if any member is missing, the group rebuilds. Stale
    * fingerprints of the same data dir are garbage-collected here.
    */
  def loadOrBuildAll(s: SparkSession, dir: String, names: Seq[String])(
      build: => Seq[DataFrame]): Seq[DataFrame] = {
    val fp = fingerprint(dir)
    val fpDir = new File(rootDir, fp)
    val dirs = names.map(n => new File(fpDir, n))
    val key = dirs.head.getPath
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      // gc under a per-FINGERPRINT lock, not the per-artifact lock:
      // two loadOrBuildAll calls for DIFFERENT artifacts of the same
      // data dir hold different artifact locks, and without this inner
      // lock both would sweep the same stale siblings concurrently.
      // (deleteRecursively tolerates a vanished child, but the sweep
      // itself should not race.) Leaf lock — never held while taking
      // another, so the artifact→fingerprint order cannot deadlock.
      val fpLock = locks.computeIfAbsent("fp:" + fpDir.getPath, _ => new Object)
      fpLock.synchronized {
        writeMeta(fpDir, dir)
        gc(dir, keepFingerprint = fp): Unit
      }
      if (!dirs.forall(d => new File(d, "_SUCCESS").isFile)) {
        val built = build
        require(built.length == names.length,
          s"build produced ${built.length} frames for ${names.length} names")
        built.zip(dirs).foreach { case (df, d) =>
          df.write.mode("overwrite").parquet(d.getPath)
        }
      }
    }
    dirs.map(d => s.read.parquet(d.getPath))
  }

  def loadOrBuild(s: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    loadOrBuildAll(s, dir, Seq(name))(Seq(build)).head

  /** Last-modified time of an artifact's success marker, if present —
    * the "did it rebuild?" probe for specs and operators.
    */
  def artifactMtime(dir: String, name: String): Option[Long] = {
    val m = new File(artifactDir(dir, name), "_SUCCESS")
    if (m.isFile) Some(m.lastModified) else None
  }

  /** Drop every persisted artifact for `dir` (current fingerprint). */
  def invalidate(dir: String): Unit =
    deleteRecursively(new File(rootDir, fingerprint(dir)))

  /** Drop the whole store — the bench hook that makes every pass
    * re-pay its builds.
    */
  def invalidateAll(): Unit = deleteRecursively(new File(rootDir))
}
