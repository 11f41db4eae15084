package graft.pipeline

import graft.SparkSpec

/** Property-style check for deletion-vector interactions: arbitrary
  * interleavings of insert / delete / ack / merge / compact /
  * resurrect must leave the store equal to a sequential in-memory
  * model after EVERY step — the dangerous cases are exactly the
  * interleavings (a merge or ack rewriting a file that carries
  * tombstones, a re-insert of a deleted key, a compact between the
  * two). Deterministic seeded generation, same harness style as
  * MergePropertySpec.
  */
class DeletePropertySpec extends SparkSpec {

  private case class MRow(id: Long, phone: String, uploaded: Boolean)

  test("random insert/delete/ack/merge/compact/resurrect sequences match the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { trial =>
      val store = new CustomerStore(spark, tmpDir("del-prop") + "/c")
      val model = scala.collection.mutable.LinkedHashMap[String, MRow]()
      val deleted = scala.collection.mutable.ArrayBuffer[String]()
      var nextId = 1L
      def email(i: Long) = s"u$i@example.com"
      def fresh(k: Int): Seq[(Long, String, String)] =
        (0 until k).map { _ =>
          val i = nextId; nextId += 1; (i, email(i), s"p$i")
        }
      def toDf(rows: Seq[(Long, String, String)]) =
        Ingest.enrich(rows.toDF("id", "email", "phone")
          .selectExpr("id", "concat('f', id) AS first_name",
            "'l' AS last_name", "email", "phone"))
      def check(step: String): Unit = {
        val got = store.all().collect()
          .map(r => r.getString(3) ->
            MRow(r.getLong(0), r.getString(4), r.getBoolean(5)))
          .toMap
        assert(got == model.toMap, s"trial $trial after $step")
      }
      // Seed state so every op has something to chew on.
      val seed = fresh(4)
      store.insertNew(toDf(seed))
      seed.foreach { case (i, e, p) => model(e) = MRow(i, p, uploaded = false) }
      (1 to 8).foreach { step =>
        val op = rnd.nextInt(6)
        op match {
          case 0 | 1 =>
            val rs = fresh(1 + rnd.nextInt(3))
            store.insertNew(toDf(rs))
            rs.foreach { case (i, e, p) => model(e) = MRow(i, p, uploaded = false) }
          case 2 =>
            // Delete live keys, one missing key, and (no-op) one
            // already-deleted key.
            val pick = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2)) ++
              Seq(email(900000L + step)) ++ deleted.headOption
            store.delete(pick.toDF("email"))
            pick.filter(model.contains).foreach { e =>
              deleted += e; model.remove(e)
            }
          case 3 =>
            // Ack pending keys, plus a tombstoned key that must NOT flip.
            val pend = model.collect { case (e, r) if !r.uploaded => e }.toSeq
            val pick = rnd.shuffle(pend).take(1 + rnd.nextInt(2))
            if (pick.nonEmpty) {
              store.markUploaded((pick ++ deleted.lastOption).toDF("email"))
              pick.foreach(e => model(e) = model(e).copy(uploaded = true))
            }
          case 4 =>
            // Merge: phone-update two live keys + one fresh insert —
            // rewrites tombstone-carrying files.
            val live = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            val ins = fresh(1)
            val batch = live.map(e => (model(e).id, e, s"pn$step")) ++ ins
            store.merge(toDf(batch))
            live.foreach(e => model(e) = model(e).copy(phone = s"pn$step"))
            ins.foreach { case (i, e, p) => model(e) = MRow(i, p, uploaded = false) }
          case 5 =>
            if (deleted.nonEmpty && rnd.nextBoolean()) {
              // Resurrect a deleted key under a fresh id — the
              // file-scoped vector must not hide the new row.
              val e = deleted.remove(rnd.nextInt(deleted.length))
              val i = nextId; nextId += 1
              store.insertNew(toDf(Seq((i, e, s"pr$i"))))
              model(e) = MRow(i, s"pr$i", uploaded = false)
            } else {
              store.compact()
              val (_, live) = store.deletionVectorStats()
              assert(live === 0L, s"trial $trial step $step: live vectors after compact")
            }
        }
        check(s"step $step op $op")
      }
    }
  }
}
