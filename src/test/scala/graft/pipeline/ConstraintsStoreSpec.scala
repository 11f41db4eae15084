package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted CHECK constraints (CustomerStore.addCheckConstraint):
  * versioned, feed-silent metadata commits; every insert/merge from
  * then on is rejected WHOLE if any committed row would violate
  * (Delta's invariant contract), adding requires all existing rows to
  * satisfy, and rename/drop of a referenced column is refused.
  */
class ConstraintsStoreSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  private def freshStore(): (CustomerStore, String) = {
    val path = s"${tmpDir("graft-constr-")}/store"
    (new CustomerStore(spark, path), path)
  }

  test("a persisted constraint rejects violating transactions whole; dropping it re-admits them") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 8L)))                     // v1
    val v = store.addCheckConstraint("chk_id_small", "id < 1000")      // v2
    assert(v === 2L)
    assert(store.checkConstraints() === Seq(("chk_id_small", "id < 1000")))
    // DDL is feed-silent and versioned
    assert(store.feedSince(1L, 2L).isEmpty)
    // a batch with ONE violating row rejects the WHOLE transaction
    val before = store.all().count()
    intercept[ConstraintViolationException] {
      store.insertNew(Ingest.enrich(rows(Seq(50L, 5000L))))
    }
    assert(store.all().count() === before, "rejected insert must land nothing")
    assert(store.currentVersion() === 2L, "rejected insert must not commit")
    // a clean batch lands
    store.insertNew(Ingest.enrich(rows(Seq(60L))))                     // v3
    assert(store.all().count() === before + 1)
    // merge UPDATES are checked too: the id never changes on update
    // (UNIQUE-key contract), so the violation must ride a payload
    // column — a too-long phone on a matched email
    store.addCheckConstraint("chk_phone_len", "length(phone) < 12"): Unit
    intercept[ConstraintViolationException] {
      store.merge(Ingest.enrich(rows(Seq(3L)))
        .withColumn("phone", lit("999-0123456789012345")))
    }
    assert(store.all().filter(col("email") === "u3@example.com")
      .select("phone").head().getString(0) === "555-3",
      "rejected merge must leave the stored row untouched")
    store.dropCheckConstraint("chk_phone_len"): Unit
    // drop re-admits
    store.dropCheckConstraint("chk_id_small")                          // v4
    assert(store.checkConstraints().isEmpty)
    store.insertNew(Ingest.enrich(rows(Seq(5000L))))                   // v5
    assert(store.all().filter(col("id") === 5000L).count() === 1L)
  }

  test("adding a constraint requires every existing row to satisfy it; unknown columns fail loudly") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 5L)))
    intercept[IllegalArgumentException] {
      store.addCheckConstraint("chk_impossible", "id > 3")
    }
    intercept[Exception] {
      store.addCheckConstraint("chk_unknown", "no_such_column > 0")
    }
    // NULL predicate results count as violations (unknown is not clean)
    store.addCheckConstraint("chk_phone", "length(phone) > 0"): Unit
    intercept[ConstraintViolationException] {
      store.insertNew(Ingest.enrich(rows(Seq(70L)))
        .withColumn("phone", lit(null).cast("string")))
    }
    // duplicate names rejected
    intercept[IllegalArgumentException] {
      store.addCheckConstraint("CHK_PHONE", "true")
    }
  }

  test("rename/drop of a constrained column is refused until the constraint is dropped") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 4L)))
    store.addCheckConstraint("chk_phone", "length(phone) > 3"): Unit
    intercept[IllegalArgumentException] { store.renameColumn("phone", "p2") }
    intercept[IllegalArgumentException] { store.dropColumn("phone") }
    // an unreferenced column still evolves freely
    store.renameColumn("first_name", "given_name"): Unit
    store.dropCheckConstraint("chk_phone"): Unit
    store.renameColumn("phone", "phone_e164"): Unit
    assert(store.all().columns.contains("phone_e164"))
  }

  test("SQL procedures add_constraint / drop_constraint drive the same commits") {
    spark.conf.set("spark.sql.catalog.graft_store", "graft.sources.GraftStoreCatalog")
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 6L)))
    val v = spark.sql(
      s"CALL graft_store.add_constraint('$path', 'chk_id', 'id < 100')")
      .head().getLong(0)
    assert(v === 2L)
    assert(store.checkConstraints().map(_._1) === Seq("chk_id"))
    intercept[Exception] {
      store.insertNew(Ingest.enrich(rows(Seq(500L))))
    }
    spark.sql(s"CALL graft_store.drop_constraint('$path', 'chk_id')"): Unit
    assert(store.checkConstraints().isEmpty)
    store.insertNew(Ingest.enrich(rows(Seq(500L)))): Unit
    assert(store.all().filter(col("id") === 500L).count() === 1L)
  }
}
