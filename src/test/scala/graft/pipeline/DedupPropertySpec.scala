package graft.pipeline

import graft.SparkSpec

/** Property-style tests for the batching/dedup invariants promised in
  * SURVEY §5: for any input batch, insertNew keeps exactly the greedy
  * first-wins-by-(id,email) subset, order-independently of partitioning;
  * empty batches are always no-ops. Deterministic seeded generation (the
  * scalatest↔scalacheck bridge isn't on the offline classpath).
  */
class DedupPropertySpec extends SparkSpec {

  private def greedyFirstWins(rows: Seq[(Long, String)]): Seq[(Long, String)] = {
    val ids = scala.collection.mutable.Set[Long]()
    val emails = scala.collection.mutable.Set[String]()
    rows.filter { case (id, e) =>
      if (ids.contains(id) || emails.contains(e)) false
      else { ids += id; emails += e; true }
    }
  }

  /** Greedy first-wins against a pre-seeded store: rows conflicting
    * with a STORED id or email are rejected outright and must not
    * reserve their other key (the reference's INSERT fails the row;
    * csvreader.go:87-101 moves on without any constraint side effect).
    */
  private def greedyWithStore(stored: Seq[(Long, String)],
      rows: Seq[(Long, String)]): Seq[(Long, String)] = {
    val storedIds = stored.map(_._1).toSet
    val storedEmails = stored.map(_._2).toSet
    val ids = scala.collection.mutable.Set[Long]()
    val emails = scala.collection.mutable.Set[String]()
    rows.filter { case (id, e) =>
      if (storedIds.contains(id) || storedEmails.contains(e)) false
      else if (ids.contains(id) || emails.contains(e)) false
      else { ids += id; emails += e; true }
    }
  }

  private def toBatch(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Ingest.enrich(rows.toDF("id", "email")
      .selectExpr("id", "'f' AS first_name", "'l' AS last_name", "email", "'p' AS phone"))
  }

  test("store conflicts do not reserve keys against later batch rows") {
    val store = new CustomerStore(spark, tmpDir("prop") + "/c")
    assert(store.insertNew(toBatch(Seq((1L, "a@x")))) === 1)
    // (1,b@x): stored id — rejected, must NOT reserve b@x.
    // (2,b@x): both keys free after the rejection — inserted.
    // (3,a@x): stored email — rejected.
    // (4,c@x): inserted.
    val n = store.insertNew(toBatch(Seq((1L, "b@x"), (2L, "b@x"), (3L, "a@x"), (4L, "c@x"))))
    assert(n === 2)
    val got = store.all().collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(got.toSeq === Seq((1L, "a@x"), (2L, "b@x"), (4L, "c@x")))
  }

  test("insertNew == greedy first-wins against arbitrary pre-seeded stores") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { trial =>
      val stored = Seq.fill(2 + rnd.nextInt(4))(
        (1L + rnd.nextInt(10), s"u${1 + rnd.nextInt(10)}@example.com"))
      val batch = Seq.fill(4 + rnd.nextInt(16))(
        (1L + rnd.nextInt(10), s"u${1 + rnd.nextInt(10)}@example.com"))
      val store = new CustomerStore(spark, tmpDir("prop") + "/c")
      store.insertNew(toBatch(stored))
      val storedKept = greedyFirstWins(stored)
      val n = store.insertNew(toBatch(batch))
      val want = greedyWithStore(storedKept, batch)
      assert(n === want.length, s"trial $trial stored=$storedKept batch=$batch")
      val got = store.all().collect()
        .map(r => (r.getLong(0), r.getString(3))).sorted
      assert(got.toSeq === (storedKept ++ want).sorted,
        s"trial $trial stored=$storedKept batch=$batch")
    }
  }

  test("insertNew resolves long alternating conflict chains (multi-round fixpoint)") {
    // Chain built so each fixpoint round can resolve only one link:
    // (1,a) kept → (1,b) dropped by id → (2,b) kept (b freed) →
    // (2,c) dropped → (3,c) kept → (3,d) dropped → (4,d) kept.
    val chain = Seq(
      (1L, "a@x"), (1L, "b@x"), (2L, "b@x"), (2L, "c@x"),
      (3L, "c@x"), (3L, "d@x"), (4L, "d@x"))
    val store = new CustomerStore(spark, tmpDir("prop") + "/c")
    val n = store.insertNew(toBatch(chain))
    val want = greedyFirstWins(chain)
    assert(want === Seq((1L, "a@x"), (2L, "b@x"), (3L, "c@x"), (4L, "d@x")))
    assert(n === want.length)
    val got = store.all().collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(got.toSeq === want.sorted)
  }

  test("multi-file ingest order is file order, not file-size order") {
    // Spark packs scan partitions largest-file-first, so without
    // explicit sequencing the dedup winner would come from b.csv (the
    // big file). The reference reads files in order (csvreader.go:54-85)
    // — a.csv's row must win the shared email.
    val dir = java.nio.file.Files.createTempDirectory("multifile")
    java.nio.file.Files.write(dir.resolve("a.csv"),
      "100,A,A,shared@example.com,555-a\n".getBytes)
    val bulk = (1 to 60).map(i => s"${1000 + i},B$i,B$i,b$i@example.com,555-b$i")
    java.nio.file.Files.write(dir.resolve("b.csv"),
      (("200,B,B,shared@example.com,555-b" +: bulk).mkString("\n") + "\n").getBytes)
    val store = new CustomerStore(spark, tmpDir("prop") + "/c")
    val (inserted, _) = IngestJob.run(spark, dir.toString, store, header = false)
    assert(inserted === 61) // 60 bulk + exactly one shared-email winner
    val winner = store.all().filter("email = 'shared@example.com'")
      .collect().map(_.getLong(0)).toSeq
    assert(winner === Seq(100L), "file order must decide the winner")
  }

  test("insertNew == greedy first-wins for arbitrary duplicate-heavy batches") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val rows = Seq.fill(4 + rnd.nextInt(16))(
        (1L + rnd.nextInt(8), s"u${1 + rnd.nextInt(8)}@example.com"))
      import spark.implicits._
      val store = new CustomerStore(spark, tmpDir("prop") + "/c")
      // Parallelized in Seq order (the file-order analog); first-wins is
      // defined relative to that ingest order.
      val df = rows.toDF("id", "email")
        .selectExpr("id", "'f' AS first_name", "'l' AS last_name", "email", "'p' AS phone")
      val n = store.insertNew(Ingest.enrich(df))
      val want = greedyFirstWins(rows)
      assert(n === want.length, s"trial $trial rows=$rows")
      val got = store.pending().collect()
        .map(r => (r.getLong(0), r.getString(3))).sortBy(t => (t._1, t._2))
      assert(got.toSeq === want.sortBy(t => (t._1, t._2)), s"trial $trial rows=$rows")
    }
  }
}
