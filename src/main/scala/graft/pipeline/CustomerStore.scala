package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
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
class CustomerStore(spark: SparkSession, path: String) {

  import CustomerSchema._

  private def tableExists: Boolean =
    new java.io.File(path).exists() &&
      new java.io.File(path).listFiles().exists(f => f.getName.startsWith("uploaded="))

  def all(): DataFrame =
    if (tableExists)
      spark.read.schema(tableSchema).parquet(path)
        .select(tableSchema.fieldNames.map(col): _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)

  /** Typed view (SURVEY §1.3: Dataset[Customer] alongside the untyped
    * SQL surface) — compile-time field checks for callers that want
    * them; same plan underneath, no extra cost until an action.
    */
  def typed(): org.apache.spark.sql.Dataset[Customer] = {
    import spark.implicits._
    all().as[Customer]
  }

  /** Work-queue scan (S6): filter on the partition column prunes to the
    * uploaded=false directory — no data files of the done partition are
    * even listed. Column pruning to the 5 upload columns mirrors
    * database.go:18 and is derived by Catalyst from the projection.
    */
  def pending(): DataFrame =
    all().filter(!col("uploaded")).select(uploadColumns.map(col): _*)

  /** Batched insert honoring the UNIQUE(id), UNIQUE(email) contract
    * with the reference's exact sequential semantics: row i survives
    * iff no EARLIER SURVIVOR shares its id or email (row-at-a-time
    * INSERTs against both constraints, csvreader.go:87-101). That is a
    * chained condition — a naive id-dedup-then-email-dedup pass gets it
    * wrong when constraints interact (a row dropped for a dup id must
    * NOT reserve its email; caught by DedupPropertySpec). Distributed
    * form: fixpoint of "keep rows that are min-ingest-seq for BOTH
    * their id and their email among remaining rows", then remove rows
    * conflicting with the round's winners. Each round resolves at least
    * the global-min row, and in practice conflict chains are 1-2 links,
    * so 2 rounds cover real batches; each round is two key-partitioned
    * windows + two anti-joins, all shuffle-partitioned by the key.
    * Returns the number of rows actually inserted.
    */
  def insertNew(batch: DataFrame): Long = {
    // Partition-ordered ids preserve single-file CSV ingest order.
    var remaining = batch.withColumn("_seq", monotonically_increasing_id())
      .localCheckpoint(true)
    val byId = Window.partitionBy(col("id"))
    val byEmail = Window.partitionBy(col("email"))
    var survivors: DataFrame = null
    var remainingCount = remaining.count()
    while (remainingCount > 0) {
      val winners = remaining
        .withColumn("_mi", min(col("_seq")).over(byId))
        .withColumn("_me", min(col("_seq")).over(byEmail))
        .filter(col("_seq") === col("_mi") && col("_seq") === col("_me"))
        .drop("_mi", "_me")
        .localCheckpoint(true)
      survivors = if (survivors == null) winners else survivors.unionByName(winners)
      remaining = remaining
        .join(winners.select(col("id").as("_wid")), col("id") === col("_wid"), "left_anti")
        .join(winners.select(col("email").as("_wem")), col("email") === col("_wem"), "left_anti")
        .localCheckpoint(true)
      remainingCount = remaining.count()
    }
    if (survivors == null) return 0 // empty batch: reference panics here (SURVEY §2.1 S3)
    val intra = survivors.drop("_seq")
    val existing = all().select(col("id").as("_eid"), col("email").as("_eemail"))
    val fresh = intra
      .join(existing.select("_eid"), col("id") === col("_eid"), "left_anti")
      .join(existing.select("_eemail"), col("email") === col("_eemail"), "left_anti")
      .select(tableSchema.fieldNames.map(col): _*)
      .cache()
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode(SaveMode.Append).partitionBy("uploaded").parquet(path)
    fresh.unpersist()
    n
  }

  /** Post-ack state transition (S7, database.go:176-198): flip
    * uploaded=true for the given emails and touch modified_ts — the
    * explicit form of the reference's BEFORE UPDATE trigger
    * (init-db.sh:28-36). Only the pending partition is read or
    * rewritten; acked rows move to the done partition.
    */
  def markUploaded(ackedEmails: DataFrame): Unit = {
    if (!tableExists) return
    val pendingRows = all().filter(!col("uploaded"))
    val acked = ackedEmails.select(col("email").as("_ack")).distinct()
    // Materialize both sides BEFORE touching files — their lineage reads
    // the very partition being rewritten.
    val moved = pendingRows.join(acked, col("email") === col("_ack"), "left_semi")
      .withColumn("uploaded", lit(true))
      .withColumn("modified_ts", current_timestamp())
      .select(tableSchema.fieldNames.map(col): _*)
      .localCheckpoint(true)
    val kept = pendingRows.join(acked, col("email") === col("_ack"), "left_anti")
      .select(tableSchema.fieldNames.map(col): _*)
      .localCheckpoint(true)
    // Acked rows append into the done partition; the pending partition
    // directory is replaced outright (correct even when `kept` is empty,
    // which dynamic partition overwrite would silently skip).
    moved.write.mode(SaveMode.Append).partitionBy("uploaded").parquet(path)
    kept.drop("uploaded").write.mode(SaveMode.Overwrite)
      .parquet(s"$path/uploaded=false")
  }
}
