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
