package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-mapping evolution (CustomerStore.renameColumn / dropColumn):
  * metadata-only DDL commits. Files store PHYSICAL names that never
  * change, so a rename rewrites nothing and every historical file,
  * feed row, and snapshot stays readable under the new logical name;
  * a drop stops requesting the dead physical column; a re-add after a
  * drop gets a fresh version-stamped physical name so old values can
  * never resurrect (the Delta column-mapping / Iceberg field-id
  * contract, expressed with names).
  */
class SchemaMappingSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  private def freshStore(): (CustomerStore, String) = {
    val path = s"${tmpDir("graft-mapping-")}/store"
    (new CustomerStore(spark, path), path)
  }

  private def dataFilesOf(path: String): Seq[java.io.File] =
    Seq("uploaded=false", "uploaded=true")
      .map(p => new java.io.File(path, p)).filter(_.isDirectory)
      .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))

  test("rename is metadata-only: no file rewritten, every read path presents the new name over old values") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 8L)))                     // v1
    val before = dataFilesOf(path).map(f => f.getName -> f.lastModified).toMap
    val v = store.renameColumn("phone", "phone_e164")                  // v2
    assert(v === 2L)
    // metadata-only: the data files are byte-for-byte untouched
    assert(dataFilesOf(path).map(f => f.getName -> f.lastModified).toMap === before)
    // feed-silent DDL
    assert(store.changeFeed().filter(col("commit_version") === 2L).count() === 0L)
    // live read: new logical name, old values
    assert(!store.all().columns.contains("phone"))
    assert(store.all().filter(col("phone_e164") === "555-3").count() === 1L)
    // the physical name in new files stays the old one (column mapping)
    store.insertNew(Ingest.enrich(rows(Seq(100L)))
      .withColumnRenamed("phone", "phone_e164"))                       // v3
    val newest = dataFilesOf(path).filterNot(f => before.contains(f.getName))
    assert(newest.nonEmpty)
    newest.foreach { f =>
      val cols = graft.sources.ParquetGroups.fileSchema(f.toString)
        .getFields.toString
      assert(cols.contains("phone") && !cols.contains("phone_e164"),
        s"post-rename file must store the PHYSICAL name: $cols")
    }
    // feed read presents the logical name for pre- and post-rename commits
    val feed = store.changeFeed()
    assert(feed.columns.contains("phone_e164") && !feed.columns.contains("phone"))
    assert(feed.filter(col("phone_e164") === "555-100").count() === 1L)
    // connector read: renamed schema, old values, filters on the new name
    val cat = spark.read.format("graft-store").option("path", path).load()
    assert(cat.columns.contains("phone_e164"))
    assert(cat.filter(col("phone_e164") === "555-5").count() === 1L)
    // structural columns are not renamable
    intercept[IllegalArgumentException] { store.renameColumn("email", "em") }
    intercept[IllegalArgumentException] { store.renameColumn("uploaded", "up") }
    // collision and missing-source rejections
    intercept[IllegalArgumentException] { store.renameColumn("first_name", "last_name") }
    intercept[IllegalArgumentException] { store.renameColumn("nope", "x") }
  }

  test("rename crosses snapshots and asOf; merge updates through the renamed column") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 6L)))                     // v1
    assert(store.writeSnapshot() === 1L)                               // pre-rename snapshot
    store.renameColumn("phone", "phone_e164")                         // v2
    // merge carrying the RENAMED column updates stored rows
    val batch = Ingest.enrich(rows(1L to 3L))
      .withColumn("phone", concat(lit("999-"), col("id")))
      .withColumnRenamed("phone", "phone_e164")
    val r = store.merge(batch)                                         // v3
    assert(r.nUpdated === 3L)
    assert(store.all().filter(col("phone_e164").startsWith("999-")).count() === 3L)
    // asOf below the rename reads the PRE-RENAME snapshot under the
    // CURRENT schema (current-schema reads, the additive-evolution rule)
    val v1 = store.asOf(1)
    assert(v1.columns.contains("phone_e164"))
    assert(v1.filter(col("phone_e164") === "555-2").count() === 1L)
    assert(v1.filter(col("phone_e164").startsWith("999-")).count() === 0L)
    // asOf at head replays the delta over the snapshot
    assert(store.writeSnapshot() === 3L)
    assert(store.asOf(3).filter(col("phone_e164").startsWith("999-")).count() === 3L)
  }

  test("rename composes with addColumn: evolved column renamed keeps its values") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 4L)))                     // v1
    store.addColumn("loyalty_tier", LongType)                         // v2
    store.insertNew(Ingest.enrich(rows(Seq(50L)))
      .withColumn("loyalty_tier", lit(7L)))                            // v3
    store.renameColumn("loyalty_tier", "tier")                        // v4
    assert(store.all().filter(col("tier") === 7L).count() === 1L)
    assert(store.all().filter(col("tier").isNull).count() === 4L)
    // ack's file-level rewrite keeps mapped values under the new name
    store.markUploaded(Seq("u50@example.com").toDF("email"))           // v5
    assert(store.all().filter(col("uploaded") && col("tier") === 7L).count() === 1L)
  }

  test("drop removes the column everywhere; re-add cannot resurrect dropped values") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 5L)))                     // v1
    store.addColumn("score", LongType)                                // v2
    store.insertNew(Ingest.enrich(rows(Seq(60L)))
      .withColumn("score", lit(42L)))                                  // v3
    val before = dataFilesOf(path).map(f => f.getName -> f.lastModified).toMap
    store.dropColumn("score")                                         // v4
    // metadata-only: files untouched, column gone from every surface
    assert(dataFilesOf(path).map(f => f.getName -> f.lastModified).toMap === before)
    assert(!store.all().columns.contains("score"))
    assert(!store.changeFeed().columns.contains("score"))
    val cat = spark.read.format("graft-store").option("path", path).load()
    assert(!cat.columns.contains("score"))
    // RE-ADD of the same logical name: fresh physical name, all NULL —
    // the dropped 42 must NOT come back from the old file
    store.addColumn("score", LongType)                                // v5
    assert(store.all().filter(col("score").isNotNull).count() === 0L,
      "re-added column resurrected dropped values from pre-drop files")
    // structural drops rejected; unknown drops rejected
    intercept[IllegalArgumentException] { store.dropColumn("id") }
    intercept[IllegalArgumentException] { store.dropColumn("missing") }
    // base payload columns are droppable
    store.dropColumn("last_name"): Unit                                // v6
    assert(!store.all().columns.contains("last_name"))
  }

  test("mapping DDL racing DML conflicts like any full-replace commit") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 4L)))                     // v1
    // Stage a rename but interleave a data commit before its promotion
    // by racing two threads; exactly one order is observed but both
    // must leave a consistent store (the loser aborts, never corrupts).
    val t1 = new Thread(() => {
      try { store.renameColumn("phone", "p2"): Unit }
      catch { case _: ConcurrentCommitException => () }
    })
    val writer2 = new CustomerStore(spark, path)
    val t2 = new Thread(() => {
      try { writer2.insertNew(Ingest.enrich(rows(Seq(900L)))): Unit }
      catch { case _: ConcurrentCommitException => () }
    })
    t1.start(); t2.start(); t1.join(); t2.join()
    store.recover()
    // whatever landed, the table reads consistently and has ≥4 rows
    assert(store.all().count() >= 4L)
    val cols = store.all().columns.toSet
    assert(cols.contains("phone") ^ cols.contains("p2"))
  }
}
