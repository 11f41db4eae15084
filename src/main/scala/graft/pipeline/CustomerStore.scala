package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed state table with the `customers` contract the
  * reference keeps in Postgres (csv-crm-upload database/database.go):
  * unique id+email enforced as anti-join dedup (the Spark idiom for
  * "INSERT that doesn't violate UNIQUE" — init-db.sh:13,16), point
  * updates as partition-pruned rewrites, and the uploaded work-queue
  * flag as a partition column so `pending()` prunes to the
  * uploaded=false partition exactly like the reference's upload_idx
  * index scan (init-db.sh:25, database.go:18).
  *
  * Scale: partitioning by a boolean splits the table into hot (pending)
  * and cold (done) halves; the hot half is what the uploader rescans,
  * so the rescan cost tracks the backlog, not the table. markUploaded
  * rewrites only the pending partition. At 100 TB you'd swap the
  * directory-overwrite for a transactional table format, but the plan
  * shapes (anti-join insert, pruned scan, partition rewrite) carry over
  * unchanged.
  */
class CustomerStore(protected val spark: SparkSession, path: String)
    extends CustomerStoreApi {

  import CustomerSchema._
  import CustomerStore._

  // Finish (or discard) any commit interrupted by a crash before the
  // store is first read — see markUploaded's commit protocol.
  recover()

  private def tableExists: Boolean =
    new java.io.File(path).exists() &&
      new java.io.File(path).listFiles().exists(f => f.getName.startsWith("uploaded="))

  def all(): DataFrame =
    if (tableExists)
      spark.read.schema(tableSchema).parquet(path)
        .select(tableSchema.fieldNames.map(col): _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)

  /** Survivor append: new files into the uploaded=false partition,
    * through the SAME staged-commit protocol as every other mutation
    * (stage data + change-feed rows, atomic rename = commit point,
    * idempotent promotion) — an insert and its feed rows land together
    * or not at all.
    */
  protected def appendRows(fresh: DataFrame): Long = {
    val cached = fresh.cache()
    val n = cached.count()
    if (n > 0) {
      recover()
      stageAppend(cached)
      applyStaged()
    }
    cached.unpersist()
    n
  }

  /** Stage an insert commit: the fresh pending rows (commit-unique
    * file names, appended to the pending partition at promotion) plus
    * their change-feed rows.
    */
  private def stageAppend(fresh: DataFrame): Unit = {
    val tmp = new java.io.File(path, StagingTmp)
    deleteRecursively(tmp)
    val stage = new java.io.File(tmp, "pending-append")
    fresh.drop("uploaded").write.parquet(stage.toString)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    stage.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      require(f.renameTo(new java.io.File(stage, s"ins-$commitId-${f.getName}")),
        s"staging rename failed for $f")
    }
    stageChanges(tmp, changeRows(fresh, "insert"))
    val staging = new java.io.File(path, Staging)
    require(tmp.renameTo(staging), s"commit rename $tmp -> $staging failed")
  }

  /** Change-feed projection: the full row plus the change kind. */
  private def changeRows(rows: DataFrame, kind: String): DataFrame =
    rows.select(lit(kind).as("change_type") +: tableSchema.fieldNames.map(col): _*)

  /** The store's change data feed — every mutation the store has
    * committed, as full rows tagged `insert` / `update` / `ack`
    * (the CDC a downstream incremental consumer replays instead of
    * rescanning the table). All three mutation paths stage their feed
    * rows inside the SAME commit directory as the data and promote
    * them by the same atomic rename, so the feed can never show a
    * change whose data commit did not land (and recovery completes
    * both or neither).
    */
  def changeFeed(): DataFrame = {
    val dir = new java.io.File(path, Changelog)
    if (dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet")))
      spark.read.schema(changeSchema).parquet(dir.toString)
        .select(changeSchema.fieldNames.map(col): _*)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], changeSchema)
  }

  private def changeSchema =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("change_type",
        org.apache.spark.sql.types.StringType, nullable = false) +: tableSchema.fields)

  /** Post-ack state transition (S7, database.go:176-198): flip
    * uploaded=true for the given emails and touch modified_ts — the
    * explicit form of the reference's BEFORE UPDATE trigger
    * (init-db.sh:28-36). Only the pending partition is read or
    * rewritten; acked rows move to the done partition.
    *
    * Commit protocol (the analog of the reference's BEGIN/COMMIT,
    * database.go:131-153): both partition outputs are first written to
    * an underscore-prefixed staging directory (invisible to the parquet
    * reader), then a single atomic directory rename marks the commit
    * point, then the staged outputs are promoted — pending directory
    * swapped, done-partition files moved in under commit-unique names.
    * A crash before the rename leaves the table untouched; a crash
    * after it is finished idempotently by [[recover]] on next open. At
    * no point can a row exist in both partitions, and the kept pending
    * rows are never the only copy at risk mid-write.
    */
  def markUploaded(ackedEmails: DataFrame): Unit = {
    if (!tableExists) return
    recover()
    val pendingRows = all().filter(!col("uploaded"))
    val acked = ackedEmails.select(col("email").as("_ack")).distinct()
    val moved = pendingRows.join(acked, col("email") === col("_ack"), "left_semi")
      .withColumn("uploaded", lit(true))
      .withColumn("modified_ts", current_timestamp())
      .select(tableSchema.fieldNames.map(col): _*)
      .localCheckpoint(true) // one evaluation feeds both the commit and its changelog
    val kept = pendingRows.join(acked, col("email") === col("_ack"), "left_anti")
      .select(tableSchema.fieldNames.map(col): _*)
    stageCommit(moved, kept, changeRows(moved, "ack"))
    applyStaged()
  }

  /** MERGE apply (see [[CustomerStoreApi.merge]]): replace the rows
    * whose email is updated, append the inserts, leave everything else
    * — executed as a staged full rewrite of both partitions under the
    * same commit protocol as [[markUploaded]] (stage to `_staging.tmp`,
    * atomic rename = commit point, idempotent promotion). `updates`
    * and `inserts` arrive materialized, and the staged outputs are
    * fully written from the ORIGINAL files before any promotion, so
    * the table is never read after its files start moving.
    *
    * Scale note: a merge rewrites the table here; a transactional
    * format (the 100 TB swap-in, see class doc) turns the same
    * updates/inserts frames into a file-level MERGE commit — the
    * classification plan carries over unchanged.
    */
  protected def applyMerge(updates: DataFrame, inserts: DataFrame): Unit = {
    if (updates.isEmpty && inserts.isEmpty) return
    if (!tableExists) { appendRows(inserts): Unit; return }
    recover()
    val untouched = all()
      .join(updates.select(col("email").as("_ue")), col("email") === col("_ue"), "left_anti")
      .select(tableSchema.fieldNames.map(col): _*)
    val next = untouched.unionByName(updates).unionByName(inserts)
    stageFullCommit(
      next.filter(!col("uploaded")),
      next.filter(col("uploaded")),
      changeRows(updates, "update").unionByName(changeRows(inserts, "insert")))
    applyStaged()
  }

  /** Stage a FULL-replace commit of both partitions (the merge path),
    * then atomically rename to `_staging` — same commit point and
    * recovery rules as [[stageCommit]], but the done partition is
    * replaced wholesale (`done` stage dir) rather than appended to
    * (`done-append`).
    */
  private[pipeline] def stageFullCommit(pending: DataFrame, done: DataFrame,
      changes: DataFrame): Unit = {
    val tmp = new java.io.File(path, StagingTmp)
    deleteRecursively(tmp)
    pending.drop("uploaded").write.parquet(new java.io.File(tmp, "pending").toString)
    done.drop("uploaded").write.parquet(new java.io.File(tmp, "done").toString)
    stageChanges(tmp, changes)
    val staging = new java.io.File(path, Staging)
    require(tmp.renameTo(staging), s"commit rename $tmp -> $staging failed")
  }

  /** Stage this commit's change-feed rows next to its data outputs,
    * under commit-unique file names so crash replay cannot clobber
    * files a previous promotion already landed in `_changelog/`.
    */
  private def stageChanges(tmp: java.io.File, changes: DataFrame): Unit = {
    val dir = new java.io.File(tmp, "changelog")
    changes.write.parquet(dir.toString)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      require(f.renameTo(new java.io.File(dir, s"chg-$commitId-${f.getName}")),
        s"staging rename failed for $f")
    }
  }

  /** Write both partition outputs to `_staging.tmp` and atomically
    * rename it to `_staging` (the commit point). Separated from
    * [[applyStaged]] so crash-recovery specs can stop exactly at the
    * commit point. Partition column is carried by directory name, not
    * file content, so both outputs drop `uploaded`.
    */
  private[pipeline] def stageCommit(moved: DataFrame, kept: DataFrame,
      changes: DataFrame): Unit = {
    val tmp = new java.io.File(path, StagingTmp)
    deleteRecursively(tmp)
    moved.drop("uploaded").write.parquet(new java.io.File(tmp, "done-append").toString)
    kept.drop("uploaded").write.parquet(new java.io.File(tmp, "pending").toString)
    stageChanges(tmp, changes)
    // Commit-unique file names now, so replay after a crash cannot
    // clobber files a previous commit already promoted.
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val doneStage = new java.io.File(tmp, "done-append")
    doneStage.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      require(f.renameTo(new java.io.File(doneStage, s"ack-$commitId-${f.getName}")),
        s"staging rename failed for $f")
    }
    val staging = new java.io.File(path, Staging)
    require(tmp.renameTo(staging), s"commit rename $tmp -> $staging failed")
  }

  /** Promote a committed staging directory into the table. Idempotent:
    * each step checks what a previous (crashed) attempt already did.
    */
  private[pipeline] def applyStaged(): Unit = {
    val staging = new java.io.File(path, Staging)
    if (!staging.exists()) return
    val pendingStage = new java.io.File(staging, "pending")
    val doneStage = new java.io.File(staging, "done-append")
    if (pendingStage.exists()) {
      val pendingDir = new java.io.File(path, "uploaded=false")
      deleteRecursively(pendingDir)
      require(pendingStage.renameTo(pendingDir), s"promote $pendingStage failed")
    }
    if (doneStage.exists()) {
      val doneDir = new java.io.File(path, "uploaded=true")
      doneDir.mkdirs()
      doneStage.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        require(f.renameTo(new java.io.File(doneDir, f.getName)), s"promote $f failed")
      }
      deleteRecursively(doneStage)
    }
    // Insert commit: append the staged fresh files into the pending
    // partition (names are commit-unique, so crash replay is a no-op
    // for files a previous attempt already moved).
    val pendAppend = new java.io.File(staging, "pending-append")
    if (pendAppend.exists()) {
      val pendingDir = new java.io.File(path, "uploaded=false")
      pendingDir.mkdirs()
      pendAppend.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        require(f.renameTo(new java.io.File(pendingDir, f.getName)), s"promote $f failed")
      }
      deleteRecursively(pendAppend)
    }
    // Full-replace done stage (the merge path): swap the whole
    // partition, mirroring the pending swap above.
    val doneFull = new java.io.File(staging, "done")
    if (doneFull.exists()) {
      val doneDir = new java.io.File(path, "uploaded=true")
      deleteRecursively(doneDir)
      require(doneFull.renameTo(doneDir), s"promote $doneFull failed")
    }
    // Change-feed promotion: append this commit's rows (already under
    // commit-unique names, so replay after a crash is a no-op for
    // files a previous attempt landed).
    val chgStage = new java.io.File(staging, "changelog")
    if (chgStage.exists()) {
      val chgDir = new java.io.File(path, Changelog)
      chgDir.mkdirs()
      chgStage.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        require(f.renameTo(new java.io.File(chgDir, f.getName)), s"promote $f failed")
      }
      deleteRecursively(chgStage)
    }
    deleteRecursively(staging)
  }

  /** Crash recovery, run at open and before each commit: a committed
    * staging directory is applied to completion; an uncommitted
    * `_staging.tmp` (crash before the commit point) is discarded.
    */
  def recover(): Unit = {
    applyStaged()
    deleteRecursively(new java.io.File(path, StagingTmp))
  }
}

object CustomerStore {
  /** Underscore prefix keeps all three out of Spark/Hadoop data discovery. */
  private[pipeline] val Staging = "_staging"
  private[pipeline] val StagingTmp = "_staging.tmp"
  private[pipeline] val Changelog = "_changelog"

  private[pipeline] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) require(f.delete(), s"could not delete $f")
  }
}
