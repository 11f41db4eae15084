package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Ingest semantics ported from the reference's csvreader specs
  * (cmd/csvreader/csvreader_test.go) plus the corrected behaviors from
  * SURVEY §7.4: single header skip, empty-batch no-op, quarantine
  * reasons.
  */
class IngestSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val f = Files.createTempFile("ingest", ".csv")
    Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  // Mirrors assets/MOCK_BAD_DATA.csv semantics (no header: bad id "500l",
  // empty email, duplicate email) without copying its content.
  private val badDataLines = Seq(
    "1,Ann,Aardvark,ann@example.com,555-0001",
    "2x,Bob,Badger,bob@example.com,555-0002", // bad id → quarantined
    "3,Cai,Crane,,555-0003", // empty email → quarantined
    "4,Dee,Deer,ann@example.com,555-0004", // dup email → dedup drops
    "5,Eli,Eagle,eli@example.com,555-0005")

  test("validate splits bad id and empty email into quarantine with reasons") {
    val raw = Ingest.readCsv(spark, writeCsv(badDataLines), header = false)
    val (good, bad) = Ingest.validate(raw)
    assert(good.count() === 3) // rows 1, 4, 5 (dup email is dedup's job)
    val reasons = bad.select("reason").collect().map(_.getString(0)).sorted
    assert(reasons === Array("bad_id", "empty_email"))
  }

  test("header is skipped exactly once (reference double-skip bug corrected)") {
    val withHeader = "id,first_name,last_name,email,phone" +: badDataLines
    val raw = Ingest.readCsv(spark, writeCsv(withHeader), header = true)
    val (good, bad) = Ingest.validate(raw)
    // The reference loses data row 1 here (csvreader.go:38-42 + 55-59);
    // correct behavior keeps all 5 data rows.
    assert(good.count() + bad.count() === 5)
  }

  test("enrich adds uploaded=false and timestamps") {
    val raw = Ingest.readCsv(spark, writeCsv(badDataLines), header = false)
    val (good, _) = Ingest.validate(raw)
    val enriched = Ingest.enrich(good)
    assert(enriched.columns.toSet === CustomerSchema.tableSchema.fieldNames.toSet)
    assert(enriched.filter("uploaded").count() === 0)
    assert(enriched.filter("created_ts IS NULL OR modified_ts IS NULL").count() === 0)
  }

  // Every store-contract test runs against BOTH implementations: the
  // parquet store and the embedded-DB JDBC store (the reference's
  // actual sink shape, database.go:16-19).
  private val storeFactories: Seq[(String, () => CustomerStoreApi)] = Seq(
    "parquet" -> (() => new CustomerStore(spark, tmpDir("store") + "/customers")),
    "jdbc" -> (() => new JdbcCustomerStore(spark,
      s"jdbc:derby:${tmpDir("db")}/cust;create=true")))

  storeFactories.foreach { case (label, mkStore) =>

    test(s"store insert dedups within batch (first wins) and across batches [$label]") {
      val store = mkStore()
      val raw = Ingest.readCsv(spark, writeCsv(badDataLines), header = false)
      val (good, _) = Ingest.validate(raw)
      // Intra-batch: id 4 reuses ann@example.com → dropped (first wins).
      assert(store.insertNew(Ingest.enrich(good)) === 2)
      assert(store.pending().count() === 2)
      // Cross-batch: re-inserting the same file inserts nothing.
      assert(store.insertNew(Ingest.enrich(good)) === 0)
      assert(store.pending().count() === 2)
      // Fresh id+email still lands.
      val more = Ingest.readCsv(spark,
        writeCsv(Seq("9,Zoe,Zebra,zoe@example.com,555-0009")), header = false)
      val (good2, _) = Ingest.validate(more)
      assert(store.insertNew(Ingest.enrich(good2)) === 1)
      assert(store.pending().count() === 3)
    }

    test(s"IngestJob writes quarantined rows to the reject sink and typed view works [$label]") {
      val dir = tmpDir("rej")
      val store = mkStore()
      val (inserted, _) = IngestJob.run(spark, writeCsv(badDataLines), store,
        header = false, rejectDir = Some(s"$dir/rejects"))
      assert(inserted === 2)
      val rejects = spark.read.parquet(s"$dir/rejects")
      assert(rejects.count() === 2)
      assert(rejects.columns.contains("reason"))
      // Typed Dataset surface: compile-time field access.
      val emails = store.typed().collect().map(_.email).sorted
      assert(emails === Array("ann@example.com", "eli@example.com"))
    }

    test(s"empty batch is a no-op (reference panics on exact-multiple buffer) [$label]") {
      val store = mkStore()
      val raw = Ingest.readCsv(spark, writeCsv(Seq("nonsense")), header = false)
      val (good, _) = Ingest.validate(raw)
      assert(store.insertNew(Ingest.enrich(good)) === 0)
      assert(store.pending().count() === 0)
    }

    test(s"markUploaded flips the flag, touches modified_ts, preserves done rows [$label]") {
      val store = mkStore()
      val raw = Ingest.readCsv(spark, writeCsv(badDataLines), header = false)
      val (good, _) = Ingest.validate(raw)
      store.insertNew(Ingest.enrich(good))
      import spark.implicits._
      store.markUploaded(Seq("ann@example.com").toDF("email"))
      assert(store.pending().count() === 1)
      assert(store.all().filter("uploaded").count() === 1)
      // Second ack must not clobber the first done row.
      store.markUploaded(Seq("eli@example.com").toDF("email"))
      assert(store.pending().count() === 0)
      assert(store.all().filter("uploaded").count() === 2)
      val touched = store.all().filter("uploaded")
        .filter("modified_ts >= created_ts").count()
      assert(touched === 2)
    }
  }

  test("JDBC range-partitioned read returns the same rows in parallel") {
    val dbUrl = s"jdbc:derby:${tmpDir("db")}/par;create=true"
    val seeded = new JdbcCustomerStore(spark, dbUrl)
    val raw = Ingest.readCsv(spark, writeCsv(badDataLines), header = false)
    val (good, _) = Ingest.validate(raw)
    assert(seeded.insertNew(Ingest.enrich(good)) === 2)
    val parallel = new JdbcCustomerStore(spark, dbUrl, readPartitions = 3)
    val df = parallel.all()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      seeded.all().collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("JDBC per-row salvage drops only offenders when the DB rejects a racer") {
    // Drive appendRows directly (bypassing insertNew's pre-filter) the
    // way a racing writer would: the batch INSERT hits the DB's UNIQUE
    // arbiter, fails, and the per-row salvage lands every non-offending
    // row (S5 semantics, database.go:140-151).
    val store = new JdbcCustomerStore(spark,
      s"jdbc:derby:${tmpDir("db")}/salv;create=true") {
      def rawAppend(df: org.apache.spark.sql.DataFrame): Long = appendRows(df)
    }
    import spark.implicits._
    def batch(rows: Seq[(Long, String)]) = Ingest.enrich(
      rows.toDF("id", "email")
        .selectExpr("id", "'f' AS first_name", "'l' AS last_name", "email", "'p' AS phone"))
      .select(CustomerSchema.tableSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    assert(store.rawAppend(batch(Seq((1L, "a@x")))) === 1)
    // (1, b@x) collides on id; (3, a@x) collides on email; 2 and 4 land.
    assert(store.rawAppend(batch(
      Seq((2L, "b@x"), (1L, "dup@x"), (4L, "c@x"), (3L, "a@x")))) === 2)
    val got = store.all().collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(got.toSeq === Seq((1L, "a@x"), (2L, "b@x"), (4L, "c@x")))
  }

  test("embedded-Derby URLs are classified; client-server forms are not") {
    assert(JdbcCustomerStore.isEmbeddedDerby("jdbc:derby:/tmp/db;create=true"))
    assert(JdbcCustomerStore.isEmbeddedDerby("jdbc:derby:memory:db"))
    assert(!JdbcCustomerStore.isEmbeddedDerby("jdbc:derby://host:1527/db"))
    assert(!JdbcCustomerStore.isEmbeddedDerby("jdbc:postgresql://host/db"))
  }
}
