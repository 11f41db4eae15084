package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, DoubleType}

/** Type widening (CustomerStore.widenColumn): int → bigint as a
  * feed-silent metadata commit — no file rewritten, every read path
  * (live scan, connector, CDC feed, snapshots, asOf) serves the
  * widened type over old int32 and new int64 files alike, and only
  * lossless widenings are admitted.
  */
class TypeWideningSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  private def freshStore(): (CustomerStore, String) = {
    val path = s"${tmpDir("graft-widen-")}/store"
    (new CustomerStore(spark, path), path)
  }

  test("an int column is exact through every read path before widening") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 4L)))                       // v1
    assert(store.addColumn("points", IntegerType) === 2L)                // v2
    store.insertNew(Ingest.enrich(rows(Seq(10L, 11L)))
      .withColumn("points", (col("id") * 3).cast("int")))                // v3
    val api = store.all().filter(col("points").isNotNull)
      .select(col("id"), col("points")).orderBy(col("id"))
    assert(api.schema("points").dataType === IntegerType)
    assert(api.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((10L, 30), (11L, 33)))
    // the connector serves the int column exactly (typed Int, not Long)
    val viaConn = spark.read.format("graft-store").option("path", path).load()
    assert(viaConn.schema("points").dataType === IntegerType)
    assert(viaConn.filter(col("points").isNotNull)
      .select(col("id"), col("points")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((10L, 30), (11L, 33)))
    // ... and through the CDC feed read
    val feed = spark.read.format("graft-store").option("path", path)
      .option("feedFrom", 2).load()
    assert(feed.schema("points").dataType === IntegerType)
    assert(feed.select(col("points")).collect().map(_.getInt(0)).sorted
      === Array(30, 33))
  }

  test("widening int → bigint is metadata-only and every read serves longs") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 4L)))                       // v1
    store.addColumn("points", IntegerType): Unit                         // v2
    store.insertNew(Ingest.enrich(rows(Seq(10L, 11L)))
      .withColumn("points", (col("id") * 3).cast("int")))                // v3
    assert(store.writeSnapshot() === 3L)
    val dataFiles = store.pendingDataFilePaths()
      .map(p => p -> new java.io.File(p).lastModified()).toMap
    assert(store.widenColumn("points", LongType) === 4L)                 // v4
    // feed-silent, history-labeled, nothing rewritten
    assert(store.feedSince(3L, 4L).isEmpty, "widening must emit no feed rows")
    assert(store.history().collect()
      .find(_.getLong(0) == 4L).get.getString(2) === "ALTER COLUMN")
    dataFiles.foreach { case (p, m) =>
      assert(new java.io.File(p).lastModified() === m,
        s"widening must not rewrite $p")
    }
    // post-widening insert stores int64; old files stay int32
    store.insertNew(Ingest.enrich(rows(Seq(20L)))
      .withColumn("points", col("id") * 7))                              // v5
    val api = store.all().filter(col("points").isNotNull)
      .select(col("id"), col("points")).orderBy(col("id"))
    assert(api.schema("points").dataType === LongType)
    assert(api.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((10L, 30L), (11L, 33L), (20L, 140L)))
    // the connector serves longs over BOTH file generations
    val viaConn = spark.read.format("graft-store").option("path", path).load()
    assert(viaConn.schema("points").dataType === LongType)
    assert(viaConn.filter(col("points").isNotNull)
      .select(col("id"), col("points")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((10L, 30L), (11L, 33L), (20L, 140L)))
    // time travel below the widening presents the CURRENT schema —
    // the pre-widening snapshot's int32 pages upcast on read
    val asOf3 = store.asOf(3L)
    assert(asOf3.schema("points").dataType === LongType)
    assert(asOf3.filter(col("points").isNotNull).select(col("points"))
      .collect().map(_.getLong(0)).sorted === Array(30L, 33L))
    val ttConn = spark.read.format("graft-store").option("path", path)
      .option("versionAsOf", 3).load()
    assert(ttConn.schema("points").dataType === LongType)
    assert(ttConn.filter(col("points").isNotNull).select(col("points"))
      .collect().map(_.getLong(0)).sorted === Array(30L, 33L))
    // the CDC feed serves longs over pre-widening int32 feed files
    val feed = spark.read.format("graft-store").option("path", path)
      .option("feedFrom", 2).load()
    assert(feed.schema("points").dataType === LongType)
    assert(feed.select(col("points")).filter(col("points").isNotNull)
      .collect().map(_.getLong(0)).sorted === Array(30L, 33L, 140L))
    // merge THROUGH the widened column over a pre-widening file (the
    // batch-carried points diff alone would also mark the row updated
    // since round 15's detection extension; the changed phone keeps
    // this pin independent of that contract)
    store.merge(Ingest.enrich(rows(Seq(10L)))
      .withColumn("phone", lit("999-10"))
      .withColumn("points", lit(999L)))                                  // v6
    assert(store.all().filter(col("id") === 10L)
      .select(col("points")).head().getLong(0) === 999L)
  }

  test("only lossless widenings are admitted; structural columns refused") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 3L)))                       // v1
    store.addColumn("points", IntegerType): Unit                         // v2
    intercept[IllegalArgumentException] {
      store.widenColumn("points", DoubleType) // int → double is not servable
    }
    store.widenColumn("points", LongType): Unit                          // v3
    intercept[IllegalArgumentException] {
      store.widenColumn("points", IntegerType) // narrowing
    }
    intercept[IllegalArgumentException] {
      store.widenColumn("first_name", LongType) // string → long
    }
    intercept[IllegalArgumentException] {
      store.widenColumn("id", LongType) // structural (already long)
    }
    intercept[IllegalArgumentException] {
      store.widenColumn("nope", LongType) // unknown
    }
    intercept[IllegalArgumentException] {
      store.addColumn("ratio", DoubleType) // outside the decode grammar
    }
    // SQL face: ALTER COLUMN TYPE widens through the catalog
    spark.conf.set("spark.sql.catalog.graft_store",
      "graft.sources.GraftStoreCatalog")
    store.addColumn("score", IntegerType): Unit                          // v4
    spark.sql(s"ALTER TABLE graft_store.`$path` ALTER COLUMN score TYPE BIGINT")
    assert(store.tableSchema("score").dataType === LongType)
    assert(store.currentVersion() === 5L)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft_store.`$path` ALTER COLUMN score TYPE INT")
    }
  }
}
