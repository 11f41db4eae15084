package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The reference's single relational table, re-expressed as a Spark
  * schema (csv-crm-upload postgres/entrypoint-init.d/init-db.sh:11-21)
  * plus the positional CSV input schema its reader consumes
  * (cmd/csvreader/csvreader.go:120-128: id,first,last,email,phone).
  */
object CustomerSchema {

  /** Raw CSV columns, positional; id arrives as string and is cast
    * during validation (strconv.Atoi analog, csvreader.go:120-124) so a
    * bad id becomes a quarantined row instead of a read failure.
    */
  val csvSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("_corrupt_record", StringType)))

  /** The customers table (init-db.sh:11-21). */
  val tableSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType, nullable = false),
    StructField("phone", StringType),
    StructField("uploaded", BooleanType, nullable = false),
    StructField("created_ts", TimestampType),
    StructField("modified_ts", TimestampType)))

  val uploadColumns: Seq[String] =
    Seq("id", "first_name", "last_name", "email", "phone")

  /** The change-data-feed row: every committed mutation as a full row
    * tagged insert/update/ack (+ `_pre` retractions, `delete_pre`
    * tombstones), stamped with its commit's version. Shared by the
    * store's feed readers and the DSv2 CDC scan.
    */
  val changeSchema: StructType = StructType(
    StructField("commit_version", LongType, nullable = false) +:
    StructField("change_type", StringType, nullable = false) +:
    tableSchema.fields)
}

/** Typed row for Dataset-based paths (database/database.go:32-42). */
case class Customer(
    id: Long,
    first_name: String,
    last_name: String,
    email: String,
    phone: String,
    uploaded: Boolean,
    created_ts: Timestamp,
    modified_ts: Timestamp)
