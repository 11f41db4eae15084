package graft.pipeline

import graft.SparkSpec

/** Property-style check for the merge contract: for arbitrary
  * duplicate-heavy batches, `merge` must agree — counts and final
  * table state — with an independent in-memory emulator of the
  * documented semantics (normalize last-wins per email; matched rows
  * update payload keeping the stored id; identical matches untouched;
  * unmatched rows insert unless the id is taken by the store or an
  * earlier insert). Deterministic seeded generation, same harness
  * style as DedupPropertySpec.
  */
class MergePropertySpec extends SparkSpec {

  /** (id, first_name, email, phone) — last_name held constant. */
  private type R = (Long, String, String, String)

  /** In-memory reference: returns (final rows, nUpdated, nInserted,
    * nUnchanged, nConflicts). Stored rows must already satisfy
    * UNIQUE(id,email).
    */
  private def model(stored: Seq[R], batch: Seq[R]): (Seq[R], Long, Long, Long, Long) = {
    val out = scala.collection.mutable.LinkedHashMap[String, R]()
    stored.foreach(r => out(r._3) = r)
    val storedIds = stored.map(_._1).toSet
    // Normalize: last row per email in batch order.
    val lastIdx = batch.zipWithIndex.groupBy(_._1._3)
      .map { case (_, rs) => rs.map(_._2).max }.toSet
    val latest = batch.zipWithIndex.collect { case (r, i) if lastIdx(i) => r }
    var nUp = 0L; var nIns = 0L; var nUnch = 0L; var nConf = 0L
    val insertedIds = scala.collection.mutable.Set[Long]()
    latest.foreach { r =>
      out.get(r._3) match {
        case Some(s) =>
          if (s._2 == r._2 && s._4 == r._4) nUnch += 1
          else { out(r._3) = (s._1, r._2, r._3, r._4); nUp += 1 } // stored id kept
        case None =>
          if (!storedIds.contains(r._1) && !insertedIds.contains(r._1)) {
            insertedIds += r._1; out(r._3) = r; nIns += 1
          } else nConf += 1 // dropped: id taken by the store or an earlier insert
      }
    }
    (out.values.toSeq, nUp, nIns, nUnch, nConf)
  }

  private def toBatch(rows: Seq[R]) = {
    import spark.implicits._
    Ingest.enrich(rows.toDF("id", "first_name", "email", "phone")
      .selectExpr("id", "first_name", "'l' AS last_name", "email", "phone"))
  }

  test("merge == sequential update-else-insert model for arbitrary batches") {
    val rnd = new scala.util.Random(11)
    (1 to 6).foreach { trial =>
      // Seed: distinct ids AND emails (a valid table state).
      val storedIds = rnd.shuffle((1L to 12L).toList).take(3 + rnd.nextInt(4))
      val stored = storedIds.map(i =>
        (i, s"f${rnd.nextInt(3)}", s"u$i@example.com", s"p${rnd.nextInt(3)}"))
      val batch = Seq.fill(5 + rnd.nextInt(15))(
        (1L + rnd.nextInt(15), s"f${rnd.nextInt(3)}",
          s"u${1 + rnd.nextInt(15)}@example.com", s"p${rnd.nextInt(3)}"))
      val store = new CustomerStore(spark, tmpDir("merge-prop") + "/c")
      assert(store.insertNew(toBatch(stored)) === stored.length)
      val got = store.merge(toBatch(batch))
      val (wantRows, nUp, nIns, nUnch, nConf) = model(stored, batch)
      assert(got === MergeResult(nUp, nIns, nUnch, nConf),
        s"trial $trial stored=$stored batch=$batch")
      val gotRows = store.all().collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3), r.getString(4)))
        .sortBy(_._3)
      assert(gotRows.toSeq === wantRows.sortBy(_._3),
        s"trial $trial stored=$stored batch=$batch")
    }
  }
}
