package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SHALLOW CLONE (table fork): `cloneTo` materializes an independent
  * table whose parquet artifacts are hard links (zero data copy) and
  * whose metadata is copied — full history / time travel / CDC travel
  * with the fork, mutations and maintenance never cross it, writer
  * txn state stays behind, the ingest registry travels.
  */
class CloneSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  private def emails(ids: Seq[Long]) =
    ids.toDF("id").select(concat(lit("u"), col("id"), lit("@example.com")).as("email"))

  private def line(i: Long) = s"$i,f$i,l$i,u$i@example.com,555-$i"

  private def writeCsv(dir: String, name: String, body: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name),
      ("id,first_name,last_name,email,phone" +: body).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }

  private def nlink(p: java.nio.file.Path): Int =
    java.nio.file.Files.getAttribute(p, "unix:nlink")
      .asInstanceOf[Number].intValue

  private def parquets(root: String): Seq[java.nio.file.Path] = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
    } finally walk.close()
  }

  private def fork(): (CustomerStore, CustomerStore, String, String) = {
    val srcPath = s"${tmpDir("graft-clone-")}/src"
    val src = new CustomerStore(spark, srcPath)
    src.insertNew(Ingest.enrich(rows(1L to 20L))): Unit              // v1
    src.markUploaded(emails((1L to 20L).filter(_ % 2 == 0)))         // v2
    val dstPath = s"${tmpDir("graft-clone-")}/dst"
    assert(src.cloneTo(dstPath) === 2L)
    (src, new CustomerStore(spark, dstPath), srcPath, dstPath)
  }

  test("clone is an identical zero-copy fork: data, history, time travel, CDC") {
    val (src, cl, _, dstPath) = fork()
    assert(cl.currentVersion() === 2L)
    assert(cl.all().exceptAll(src.all()).isEmpty)
    assert(src.all().exceptAll(cl.all()).isEmpty)
    // The fork keeps the whole lineage: time travel and the feed work.
    assert(cl.asOf(1L).count() === 20L)
    assert(cl.asOf(1L).filter(col("uploaded")).count() === 0L)
    assert(cl.changeFeed().count() === src.changeFeed().count())
    assert(cl.history().count() === src.history().count())
    // Zero-copy pinned: every cloned parquet shares its source inode.
    val linked = parquets(dstPath)
    assert(linked.nonEmpty)
    assert(linked.forall(nlink(_) >= 2),
      "a cloned parquet was copied, not linked")
  }

  test("divergence is isolated both ways; maintenance never crosses the fork") {
    val (src, cl, _, _) = fork()
    val srcFeedBefore = src.changeFeed().count()
    // Clone-side mutation: ack two more rows. Source must not move.
    cl.markUploaded(emails(Seq(1L, 3L)))                             // clone v3
    assert(cl.all().filter(col("uploaded")).count() === 12L)
    assert(src.all().filter(col("uploaded")).count() === 10L)
    assert(src.currentVersion() === 2L)
    // Source-side mutation: insert new rows. Clone must not move.
    src.insertNew(Ingest.enrich(rows(21L to 25L))): Unit             // src v3
    assert(src.all().count() === 25L)
    assert(cl.all().count() === 20L)
    // Maintenance on the clone (snapshot → compact → feed vacuum)
    // unlinks the clone's directory entries only: the source's reads
    // and full-from-genesis feed stay complete.
    cl.writeSnapshot(): Unit
    cl.compact()
    cl.vacuumFeed(): Unit
    assert(cl.all().count() === 20L)
    assert(cl.all().filter(col("uploaded")).count() === 12L)
    assert(src.all().count() === 25L)
    // +5: the source's own post-fork insert commit.
    assert(src.changeFeed().count() === srcFeedBefore + 5L)
  }

  test("writer txn state stays behind; the ingest registry travels") {
    val srcPath = s"${tmpDir("graft-clone-")}/src"
    val src = new CustomerStore(spark, srcPath)
    val in = s"${tmpDir("graft-clone-")}/in"
    writeCsv(in, "b01.csv", (1L to 6L).map(line))
    assert(src.ingestNewFiles(in) === ((1L, 6L, 0L)))
    src.txnInsert("app", 3L, Ingest.enrich(rows(7L to 9L))): Unit
    val dstPath = s"${tmpDir("graft-clone-")}/dst"
    src.cloneTo(dstPath): Unit
    val cl = new CustomerStore(spark, dstPath)
    // _txns did not travel: the clone has no writer history, so a
    // lower-versioned write APPLIES instead of silently skipping.
    assert(cl.latestTxnVersion("app") === None)
    assert(cl.txnInsert("app", 1L, Ingest.enrich(rows(10L to 11L))).isDefined)
    // _ingested DID travel: COPY INTO of a loaded file stays a no-op.
    assert(cl.ingestNewFiles(in) === ((0L, 0L, 0L)))
    // The source's registry is untouched by the clone's writes.
    assert(src.latestTxnVersion("app") === Some(3L))
    assert(src.all().count() === 9L)
  }

  test("clone refuses a non-empty or nested target and an empty source") {
    val srcPath = s"${tmpDir("graft-clone-")}/src"
    val src = new CustomerStore(spark, srcPath)
    intercept[IllegalArgumentException](src.cloneTo(s"${tmpDir("x-")}/dst"))
    src.insertNew(Ingest.enrich(rows(1L to 3L))): Unit
    intercept[IllegalArgumentException](src.cloneTo(s"$srcPath/nested"))
    val occupied = tmpDir("graft-clone-occupied-")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(occupied, "stale"), Array[Byte](1))
    intercept[IllegalArgumentException](src.cloneTo(occupied))
  }

  test("SQL procedure: CALL graft_store.clone forks the table") {
    val srcPath = s"${tmpDir("graft-clone-")}/src"
    new CustomerStore(spark, srcPath)
      .insertNew(Ingest.enrich(rows(1L to 8L))): Unit
    val dstPath = s"${tmpDir("graft-clone-")}/dst"
    spark.conf.set("spark.sql.catalog.graft_store",
      "graft.sources.GraftStoreCatalog")
    val out = spark.sql(
      s"CALL graft_store.clone('$srcPath', '$dstPath')").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(new CustomerStore(spark, dstPath).all().count() === 8L)
  }
}
