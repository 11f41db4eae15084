package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class JsonLinesSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("documents round-trip through JSONL losslessly") {
    val out = tmpDir("jsonl") + "/docs"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    JsonLines.write(docs, out)
    val s = JsonLines.salvage(JsonLines.read(spark, out, docSchema))
    assert(s.bad.count() === 0)
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val b = s.good.select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(a.toSeq === b.toSeq)
    s.release()
  }

  test("gzip-compressed JSONL round-trips and produces .gz part files") {
    val out = tmpDir("jsonl-gz") + "/docs"
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    JsonLines.write(docs, out, compression = "gzip")
    val parts = new java.io.File(out).listFiles.map(_.getName).filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".json.gz")), parts.toSeq.toString)
    val gz = JsonLines.salvage(JsonLines.read(spark, out, docSchema))
    assert(gz.good.count() === docs.count())
    gz.release()
  }

  test("the same schema/options ingest JSONL incrementally under readStream") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = tmpDir("jsonl-stream")
    Files.write(Paths.get(dir, "a.jsonl"),
      """{"doc_id": 1, "lang": "en", "text": "first"}""".getBytes)
    val q = spark.readStream
      .schema(docSchema)
      .json(dir)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode(OutputMode.Append())
      .start()
    q.processAllAvailable()
    Files.write(Paths.get(dir, "b.jsonl"),
      """{"doc_id": 2, "lang": "de", "text": "second"}""".getBytes)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("jsonl_stream").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L),
      "files must be picked up incrementally with the explicit schema")
  }

  test("malformed lines are quarantined whole; the rest of the batch lands") {
    val dir = tmpDir("jsonl-bad")
    Files.write(Paths.get(dir, "a.jsonl"), Seq(
      """{"doc_id": 1, "lang": "en", "text": "ok one"}""",
      """{"doc_id": oops not json""",
      """{"doc_id": 3, "lang": "de", "text": "ok three"}""").mkString("\n").getBytes)
    val s = JsonLines.salvage(JsonLines.read(spark, dir, docSchema))
    assert(s.good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    val quarantined = s.bad.collect().map(_.getString(0))
    assert(quarantined.length === 1 && quarantined.head.contains("oops"),
      s"the raw offending line must be preserved: ${quarantined.toSeq}")
    s.release()
  }
}
