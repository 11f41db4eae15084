package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{CustomerSchema, CustomerStoreApi, Ingest, Signal}

/** Incremental CSV ingestion — the reference csvReader's streaming soul
  * (SURVEY §2.4 T1/T2) on Structured Streaming. The file source
  * discovers new CSVs per trigger; each micro-batch runs the same
  * validate→enrich→dedup-insert plan as the batch job inside
  * foreachBatch, then fires the conflating signal exactly where the
  * reference RPCs after a successful insert (csvreader.go:97,103).
  *
  * Count-based 5-row buffering is an implementation detail of the Go
  * reader; the semantics that matter — every valid row inserted exactly
  * once per arrival, tail rows not lost at EOF, malformed rows skipped
  * without stopping the stream — hold per micro-batch (SURVEY §7.4.1).
  * Checkpointing makes file discovery replay-safe: a crashed batch is
  * reprocessed and the anti-join dedup makes the replay idempotent —
  * the exactly-once upgrade over the reference's at-least-once.
  */
object StreamingIngest {

  def start(spark: SparkSession, inDir: String, store: CustomerStoreApi,
      checkpoint: String, signal: Option[Signal] = None,
      header: Boolean = true): StreamingQuery =
    startWith(spark, inDir, checkpoint, header) { good =>
      store.insertNew(Ingest.enrich(good)) > 0
    }(signal)

  /** Streaming UPSERT ingestion: the same scan/validate plumbing, but
    * each micro-batch MERGES into the store (update-matched on email +
    * insert-new, [[CustomerStoreApi.merge]]) instead of insert-only —
    * the change-feed form of ingestion, where arriving rows may revise
    * existing customers. Replay safety is stronger than the insert
    * path's: merge is IDEMPOTENT (a replayed batch finds its updates
    * already applied — payload-identical matches touch nothing — and
    * its inserts already present), so checkpoint redelivery converges
    * to the same table state with no modified_ts churn.
    */
  def startUpsert(spark: SparkSession, inDir: String, store: CustomerStoreApi,
      checkpoint: String, signal: Option[Signal] = None,
      header: Boolean = true): StreamingQuery =
    startWith(spark, inDir, checkpoint, header) { good =>
      val r = store.merge(Ingest.enrich(good))
      r.nUpdated + r.nInserted > 0
    }(signal)

  private def startWith(spark: SparkSession, inDir: String, checkpoint: String,
      header: Boolean)(apply: org.apache.spark.sql.DataFrame => Boolean)(
      signal: Option[Signal]): StreamingQuery = {
    val raw = spark.readStream
      .schema(CustomerSchema.csvSchema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", 1) // micro-batch per file, T1 analog
      .csv(inDir)
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (good, _) = Ingest.validate(batch)
        if (apply(good)) signal.foreach(_.notifyData())
        ()
      }
      .start()
  }
}
