package graft.util

import java.nio.file.{Files, Path, Paths}

/** Small filesystem helpers shared by the parity gates and specs.
  * Every directory stream is closed deterministically (Files.list /
  * Files.walk leak an open directory fd until GC otherwise — a
  * long-lived driver running the parity gates repeatedly accumulates
  * them).
  */
object Fs {

  /** Entries of `dir`, stream closed. */
  def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector
    } finally s.close()
  }

  /** Delete `root` and everything under it (children first). */
  def deleteRecursively(root: Path): Unit = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector.reverse.foreach(p => Files.deleteIfExists(p))
    } finally s.close()
  }

  /** Run `f` with a scratch directory, deleting it afterwards. Any
    * Spark result computed inside must be detached (localCheckpoint /
    * collect) before returning.
    */
  def withTempDir[T](prefix: String)(f: Path => T): T = {
    val tmp = Files.createTempDirectory(prefix)
    try f(tmp)
    finally deleteRecursively(tmp)
  }

  /** The one part file under `dir`. Callers coalesce(1) before
    * writing; if that contract ever breaks (Spark splits the output),
    * silently picking the first file would drop the rest of the
    * staged data and surface as a confusing downstream hash mismatch
    * — so fail loudly instead.
    */
  private def singlePartFile(dir: Path): Path = {
    val parts = listDir(dir)
      .filter(_.getFileName.toString.startsWith("part-"))
    require(parts.size == 1,
      s"expected exactly one part file under $dir, found ${parts.size} " +
        "(caller must coalesce(1) before staging)")
    parts.head
  }

  /** Move the single part file Spark wrote under `stageDir` to
    * `dest` (creating parent dirs) — the staging step for tests that
    * need ONE named data file rather than a Spark output directory.
    */
  def movePartFile(stageDir: Path, dest: Path): Unit = {
    val part = singlePartFile(stageDir)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
  }

  /** Append raw lines to the single part file under `dir`, dropping
    * the sidecar .crc files (the local Hadoop filesystem verifies
    * them on read, and the append invalidates the checksum).
    */
  def appendToPartFile(dir: Path, lines: Seq[String]): Unit = {
    val part = singlePartFile(dir)
    val entries = listDir(dir)
    Files.writeString(part, lines.mkString("", "\n", "\n"),
      java.nio.file.StandardOpenOption.APPEND)
    entries.filter(_.getFileName.toString.endsWith(".crc"))
      .foreach(p => Files.deleteIfExists(p))
  }

  def path(first: String, more: String*): Path = Paths.get(first, more: _*)
}
