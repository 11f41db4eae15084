package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source/sink for document corpora — the interchange
  * format training pipelines exchange (one JSON object per line;
  * splittable when uncompressed, per-file compressed with gzip/zstd).
  * The reference has no JSON file I/O, but its REST sink speaks
  * row-per-JSON-object (csv-crm-upload crm/main.go marshals each
  * customer row); this is the same row contract as a file.
  *
  * Scale notes:
  *  - Reads take an EXPLICIT schema: inference is a full extra pass
  *    over the data before the real one — at 100 TB, an extra scan.
  *  - PERMISSIVE mode + a corrupt-record column preserves the per-row
  *    salvage contract of the CSV ingest (only offending lines are
  *    quarantined, the batch lands — SURVEY §2.2 P4).
  *  - The same path/schema/options work under `readStream` for
  *    incremental directory ingest (cf. [[graft.streaming.StreamingIngest]]).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** One JSON object per line per row; `compression` = none|gzip|... */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** PERMISSIVE read: well-formed lines parse into `schema`'s columns,
    * malformed lines land whole in [[CorruptCol]] with the data
    * columns null.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Result of [[salvage]]. Call `release()` once both sides are
    * consumed — the split holds the parsed input in executor storage
    * (see salvage), and a long-lived JVM that never releases it pins
    * one cached corpus copy per call.
    */
  case class Salvaged(good: DataFrame, bad: DataFrame, private val source: DataFrame) {
    def release(): Unit = { source.unpersist(); () }
  }

  /** Split a PERMISSIVE read into good rows and quarantined raw lines.
    * The input is cached first: Spark disallows queries that project
    * only the internal corrupt-record column straight off a file scan
    * (SPARK-21610), and the two sides would otherwise scan twice.
    */
  def salvage(raw: DataFrame): Salvaged = {
    val cached = raw.cache()
    Salvaged(
      good = cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
      bad = cached.filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw_line")),
      source = cached)
  }
}
