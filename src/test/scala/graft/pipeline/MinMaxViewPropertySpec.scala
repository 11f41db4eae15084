package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style check for the non-distributive IVM: under ARBITRARY
  * interleavings of insert / vector-delete / merge commits, the
  * maintained per-group MIN/MAX view must equal the batch recompute
  * after every step — the dangerous cases are exactly the
  * interleavings (a delete of a just-inserted extremum, an update
  * pair whose retraction grazes the minimum, a group emptied and
  * later re-populated). Deterministic seeded generation, same harness
  * style as DeletePropertySpec.
  */
class MinMaxViewPropertySpec extends SparkSpec {

  test("random insert/delete/merge sequences keep the view equal to the batch recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val grp = pmod(col("id"), lit(4L))
    val store = new CustomerStore(spark, tmpDir("mmv-prop") + "/s")
    var nextId = 1L
    def email(i: Long) = s"u$i@example.com"
    def fresh(k: Int): Seq[Long] =
      (0 until k).map { _ => val i = nextId; nextId += 1; i }
    def toDf(ids: Seq[Long]) =
      Ingest.enrich(ids.toDF("id")
        .selectExpr("id", "concat('f', id) AS first_name", "'l' AS last_name",
          s"concat('u', id, '@example.com') AS email",
          "concat('p', id) AS phone"))
    val live = scala.collection.mutable.LinkedHashSet[Long]()
    def check(step: String): Unit = {
      val (view, recomputes) = MinMaxView.maintain(store, grp)
      val batch = store.all().select(grp.as("g"), col("id"))
        .groupBy(col("g")).agg(min(col("id")).as("mn"),
          max(col("id")).as("mx"), count(lit(1)).as("n"))
      assert(view.exceptAll(batch).isEmpty && batch.exceptAll(view).isEmpty,
        s"view diverged from recompute after $step")
      assert(recomputes >= 0L && recomputes <= store.currentVersion() * 4L,
        s"recompute count $recomputes out of range after $step")
    }
    val seed = fresh(6)
    store.insertNew(toDf(seed)); live ++= seed
    (1 to 8).foreach { step =>
      // Keep enough live rows for extremum deletes to stay interesting.
      (if (live.size < 3) 0 else rnd.nextInt(3)) match {
        case 0 =>
          val ids = fresh(1 + rnd.nextInt(3))
          store.insertNew(toDf(ids)); live ++= ids
        case 1 =>
          // Bias deletes toward extrema (the interesting retractions):
          // the global min, the global max, or a random interior key.
          val victims = Seq(live.min, live.max,
              live.toSeq(rnd.nextInt(live.size)))
            .distinct.take(1 + rnd.nextInt(2))
          store.delete(victims.map(email).toDF("email"))
          live --= victims
        case 2 =>
          // Merge: phone update on an extremum (update_pre grazes the
          // stored min/max with the SAME id on both sides).
          val target = if (rnd.nextBoolean()) live.min else live.max
          store.merge(toDf(Seq(target)).withColumn("phone", lit(s"new-$step")))
      }
      if (step % 2 == 0 || step == 8) check(s"step $step")
    }
  }
}
