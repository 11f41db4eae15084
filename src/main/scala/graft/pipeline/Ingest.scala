package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV scan → validate/quarantine → enrich: the csvReader service's data
  * plane (csv-crm-upload cmd/csvreader/csvreader.go) as one declarative
  * Spark plan. The reference streams row-at-a-time because "the CSV must
  * never be fully loaded into memory" (README.md:109); Spark's CSV
  * source gives the same guarantee for free — partitions stream from
  * disk, nothing materializes the file.
  */
object Ingest {

  /** Batch CSV scan, header-aware (single skip — the reference's double
    * header drop, csvreader.go:38-42 + 55-59, loses data row 1; we
    * implement the intent, and PipelineSpec pins the corrected count).
    * PERMISSIVE mode routes unparseable lines into _corrupt_record
    * instead of failing the scan (csvreader.go:79-83 log-and-continue).
    */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    readCsv(spark, Seq(path), header)

  /** Multi-file variant (the incremental-ingest path reads exactly the
    * files the registry has not seen — an explicit list, not a glob).
    */
  def readCsv(spark: SparkSession, paths: Seq[String], header: Boolean): DataFrame =
    spark.read
      .schema(CustomerSchema.csvSchema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(paths: _*)

  /** Split into (valid, quarantined). Valid = parses as CSV, id is an
    * integer (P2, csvreader.go:120-124), email non-empty (P3,
    * csvreader.go:125-127). Quarantined rows keep a reason column — the
    * Spark upgrade of the reference's log-line-and-skip (P4).
    */
  def validate(raw: DataFrame): (DataFrame, DataFrame) = {
    // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
    // would fail the whole scan on the first bad id instead of
    // quarantining the row.
    val withCast = raw
      .withColumn("id_cast", expr("try_cast(id AS LONG)"))
      .withColumn("reason",
        when(col("_corrupt_record").isNotNull, "malformed_csv")
          .when(col("id_cast").isNull, "bad_id")
          .when(col("email").isNull || length(trim(col("email"))) === 0, "empty_email"))
    val good = withCast.filter(col("reason").isNull)
      .select(col("id_cast").as("id"), col("first_name"), col("last_name"),
        col("email"), col("phone"))
    val bad = withCast.filter(col("reason").isNotNull)
      .select(col("id"), col("first_name"), col("last_name"), col("email"),
        col("phone"), col("reason"))
    (good, bad)
  }

  /** Constant enrichment (P5, database.go:65-77): work-queue flag false,
    * DB-authoritative timestamps (the reference lets Postgres defaults
    * win for modified_ts — here the write path IS the authority).
    */
  def enrich(valid: DataFrame): DataFrame =
    valid
      .withColumn("uploaded", lit(false))
      .withColumn("created_ts", current_timestamp())
      .withColumn("modified_ts", current_timestamp())

  /** Pin the batch's ingest order to FILE order for directory ingests:
    * the reference's dedup winner is defined by the order files are
    * read (csvreader.go:54-85), but Spark packs scan partitions by file
    * SIZE descending, so `monotonically_increasing_id` alone would make
    * the winner depend on file sizes. `_seq` = row_number over
    * (input_file_name, partition-sequence): exact for files below the
    * split threshold (one scan partition per file — every ingest CSV
    * here; a split file interleaves only with itself). The global sort
    * is over one bounded ingest batch, not a table — the reference
    * buffers 5-row batches at the same point (csvreader.go:60-77).
    * [[CustomerStoreApi.insertNew]] honors a pre-computed `_seq`.
    *
    * "File order" here means LEXICOGRAPHIC path order (the sort is on
    * the `input_file_name` string), which matches the reference's
    * directory-listing order for its zero-padded/single-file inputs
    * but diverges for unpadded numeric names (`b10.csv` sorts before
    * `b2.csv`) — callers that need arrival order must encode it in the
    * path (zero-padding, timestamp prefixes), the same contract as any
    * path-ordered log ingest. Chosen over file modification time
    * because mtime is not reproducible across copies of the same
    * directory.
    */
  def sequenced(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_file"), col("_pseq"))
    batch
      .withColumn("_file", input_file_name())
      .withColumn("_pseq", monotonically_increasing_id())
      .withColumn("_seq", row_number().over(w).cast("long"))
      .drop("_file", "_pseq")
  }
}
