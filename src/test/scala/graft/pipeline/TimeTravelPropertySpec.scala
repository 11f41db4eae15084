package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style check for commit versioning + asOf: arbitrary
  * mutation histories (insert / merge / ack / vector DELETE / RESTORE,
  * with random snapshot checkpoints interleaved) must replay so that
  * `asOf(v)` equals an independent in-memory model's state after
  * commit v, for EVERY v — including versions answered from a
  * snapshot + delta, versions answered by genesis replay, versions
  * whose reconstruction crosses delete tombstones, and versions
  * before/after a restore (which must never rewrite history).
  * Deterministic seeded generation, same harness style as
  * MergePropertySpec.
  *
  * The model mirrors the documented commit rules: an insert commits
  * iff ≥1 row survives the UNIQUE dedup; a merge commits iff it
  * updates or inserts at least one row (identical matches alone do
  * not commit); an ack always commits once the table exists; a delete
  * commits iff ≥1 live key matched; a restore always commits and sets
  * the state to the target version's.
  */
class TimeTravelPropertySpec extends SparkSpec {

  /** email -> (id, first_name, phone, uploaded) */
  private type State = Map[String, (Long, String, String, Boolean)]

  private def rows(rs: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    Ingest.enrich(rs.toDF("id", "first_name", "email", "phone")
      .selectExpr("id", "first_name", "'l' AS last_name", "email", "phone"))
  }

  private def snap(df: DataFrame): Set[(Long, String, String, Boolean)] =
    df.select(col("id"), col("email"), col("first_name"), col("phone"), col("uploaded"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1) + "|" + r.getString(2), r.getString(3),
        r.getBoolean(4)))
      .toSet

  private def modelSnap(st: State): Set[(Long, String, String, Boolean)] =
    st.map { case (email, (id, fn, ph, up)) => (id, email + "|" + fn, ph, up) }.toSet

  test("asOf(v) == sequential model state after commit v, for random histories") {
    val rnd = new scala.util.Random(23)
    (1 to 4).foreach { trial =>
      val store = new CustomerStore(spark, tmpDir(s"ttprop$trial") + "/store")
      var state: State = Map.empty
      var history = Vector[State]() // history(v-1) = state after commit v
      (1 to (4 + rnd.nextInt(3))).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 => // insert: conflict-free within batch by construction
            val picks = rnd.shuffle((1L to 10L).toList).take(1 + rnd.nextInt(3))
              .map(i => (i, s"f${rnd.nextInt(3)}", s"u$i@example.com", s"p${rnd.nextInt(3)}"))
            val usedIds = state.values.map(_._1).toSet
            val survivors = picks.filter { case (id, _, em, _) =>
              !usedIds.contains(id) && !state.contains(em)
            }
            store.insertNew(rows(picks)): Unit
            if (survivors.nonEmpty) {
              survivors.foreach { case (id, fn, em, ph) => state += em -> (id, fn, ph, false) }
              history :+= state
            }
          case 1 => // merge: unique emails within batch by construction
            val picks = rnd.shuffle((1L to 8L).toList).take(1 + rnd.nextInt(3))
              .map(i => (i + 20L * rnd.nextInt(2), s"f${rnd.nextInt(3)}",
                s"u$i@example.com", s"p${rnd.nextInt(3)}"))
            store.merge(rows(picks)): Unit
            val usedIds = state.values.map(_._1).toSet
            var changed = false
            var next = state
            var insIds = Set.empty[Long]
            picks.foreach { case (id, fn, em, ph) =>
              next.get(em) match {
                case Some((sid, sfn, sph, sup)) =>
                  if (sfn != fn || sph != ph) { next += em -> (sid, fn, ph, sup); changed = true }
                case None =>
                  if (!usedIds.contains(id) && !insIds.contains(id)) {
                    insIds += id; next += em -> (id, fn, ph, false); changed = true
                  }
              }
            }
            if (changed) { state = next; history :+= state }
          case 2 => // ack: commits whenever the table exists
            val acked = rnd.shuffle(state.keys.toList).take(rnd.nextInt(3))
            import spark.implicits._
            store.markUploaded(acked.toDF("email"))
            if (state.nonEmpty) {
              acked.foreach { em =>
                val (id, fn, ph, _) = state(em)
                state += em -> (id, fn, ph, true)
              }
              history :+= state
            }
          case 3 => // vector delete: commits iff >=1 live key matched
            val picks = rnd.shuffle(state.keys.toList).take(rnd.nextInt(3)) :+
              "missing@example.com"
            import spark.implicits._
            store.delete(picks.toDF("email")): Unit
            val hit = picks.filter(state.contains)
            if (hit.nonEmpty) {
              hit.foreach(em => state -= em)
              history :+= state
            }
          case 4 => // restore to a random earlier version (always commits)
            if (history.nonEmpty) {
              val v = 1 + rnd.nextInt(history.size)
              store.restore(v.toLong)
              state = history(v - 1)
              history :+= state
            }
        }
        if (rnd.nextInt(3) == 0) { store.writeSnapshot(): Unit } // exercise snapshot replay
      }
      assert(store.currentVersion() === history.size.toLong,
        s"trial $trial: version counter diverged from the model's commit count")
      history.zipWithIndex.foreach { case (st, i) =>
        assert(snap(store.asOf(i + 1L)) === modelSnap(st),
          s"trial $trial: asOf(${i + 1}) diverged from the model")
      }
      assert(snap(store.all()) === modelSnap(state), s"trial $trial: final table diverged")
    }
  }
}
