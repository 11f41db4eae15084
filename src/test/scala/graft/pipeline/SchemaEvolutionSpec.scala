package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Additive store schema evolution (CustomerStore.addColumn): a
  * nullable column appended as a feed-silent metadata commit. Reads —
  * live, snapshot, feed, asOf, connector — present the CURRENT schema
  * with pre-evolution rows null-filled; writes align batches (missing
  * column → NULLs on insert, stored value carried on merge update).
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def rows(ids: Seq[Long]) =
    ids.toDF("id")
      .withColumn("first_name", concat(lit("f"), col("id")))
      .withColumn("last_name", concat(lit("l"), col("id")))
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .withColumn("phone", concat(lit("555-"), col("id")))

  private def freshStore(): (CustomerStore, String) = {
    val path = s"${tmpDir("graft-evolve-")}/store"
    (new CustomerStore(spark, path), path)
  }

  test("addColumn is a versioned metadata commit; every read path presents the evolved schema") {
    val (store, path) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 10L)))                    // v1
    val v = store.addColumn("loyalty_tier", LongType)                  // v2
    assert(v === 2L)
    assert(store.currentVersion() === 2L)
    assert(store.commitTimestamps().map(_._1) === Seq(1L, 2L))
    // feed-silent: no change rows for the DDL commit
    assert(store.changeFeed().filter(col("commit_version") === 2L).count() === 0L)
    // live read: evolved schema, pre-evolution rows null-filled
    assert(store.all().columns.contains("loyalty_tier"))
    assert(store.all().filter(col("loyalty_tier").isNull).count() === 10L)
    // post-evolution insert CARRYING the column
    store.insertNew(Ingest.enrich(rows(Seq(100L, 101L)))
      .withColumn("loyalty_tier", col("id") % 3))                      // v3
    assert(store.all().filter(col("loyalty_tier").isNotNull).count() === 2L)
    // post-evolution insert LACKING the column → NULLs, loudness-free
    store.insertNew(Ingest.enrich(rows(Seq(200L))))                    // v4
    assert(store.all().filter(col("id") === 200L)
      .select(col("loyalty_tier")).head().isNullAt(0))
    // feed rows carry the column for post-evolution commits
    val feed3 = store.changeFeed().filter(col("commit_version") === 3L)
    assert(feed3.filter(col("loyalty_tier").isNotNull).count() === 2L)
    // connector read presents the evolved schema and the values
    val cat = spark.read.format("graft-store").option("path", path).load()
    assert(cat.columns.contains("loyalty_tier"))
    assert(cat.filter(col("loyalty_tier").isNotNull).count() === 2L)
    assert(cat.filter(col("id") === 100L).select("loyalty_tier").head().getLong(0) === 100L % 3)
    // duplicate / case-colliding additions are rejected loudly
    intercept[IllegalArgumentException] { store.addColumn("loyalty_tier", LongType) }
    intercept[IllegalArgumentException] { store.addColumn("EMAIL", LongType) }
  }

  test("evolution crosses a snapshot boundary: asOf presents the current schema, nulls filled") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 8L)))                     // v1
    assert(store.writeSnapshot() === 1L)                               // snapshot @1 (pre-evolution)
    store.addColumn("loyalty_tier", LongType)                          // v2
    store.insertNew(Ingest.enrich(rows(Seq(300L)))
      .withColumn("loyalty_tier", lit(7L)))                            // v3
    // asOf BELOW the evolution resolves through the pre-evolution
    // snapshot: current schema, all tiers null (the Iceberg read
    // contract — old versions read with the live schema)
    val v1 = store.asOf(1)
    assert(v1.columns.contains("loyalty_tier"))
    assert(v1.count() === 8L)
    assert(v1.filter(col("loyalty_tier").isNotNull).count() === 0L)
    // asOf at the head sees the carried value through snapshot + delta
    assert(store.writeSnapshot() === 3L)
    val head = store.asOf(3)
    assert(head.filter(col("loyalty_tier") === 7L).count() === 1L)
    // vacuum retires pre-snapshot feed dirs; the evolved read survives
    store.vacuumFeed(): Unit
    assert(store.asOf(3).filter(col("loyalty_tier") === 7L).count() === 1L)
    // post-vacuum LIVE read still evolved + null-filled
    assert(store.all().filter(col("loyalty_tier").isNull).count() === 8L)
  }

  test("merge on an evolved store: batch value wins when carried, stored value carried when not") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 6L)))
    store.addColumn("loyalty_tier", LongType)
    // seed tiers via a tier-carrying merge batch (changed phones force updates)
    val seed = Ingest.enrich(rows(1L to 6L))
      .withColumn("phone", concat(lit("999-"), col("id")))
      .withColumn("loyalty_tier", col("id") % 2)
    val r1 = store.merge(seed)
    assert(r1.nUpdated === 6L)
    assert(store.all().filter(col("loyalty_tier").isNotNull).count() === 6L)
    // a LEGACY batch (no tier column) updating phones must CARRY the
    // stored tier, not null it out
    val legacy = Ingest.enrich(rows(1L to 3L))
      .withColumn("phone", concat(lit("888-"), col("id")))
    val r2 = store.merge(legacy)
    assert(r2.nUpdated === 3L)
    assert(store.all().filter(col("loyalty_tier").isNotNull).count() === 6L,
      "legacy merge batch nulled out evolved values on updated rows")
    // a tier-carrying batch's value wins on update — null included
    val explicit = Ingest.enrich(rows(Seq(1L)))
      .withColumn("phone", lit("777-1"))
      .withColumn("loyalty_tier", lit(9L))
    store.merge(explicit): Unit
    assert(store.all().filter(col("id") === 1L)
      .select("loyalty_tier").head().getLong(0) === 9L)
  }

  test("addColumn on a fresh store: schema commit precedes data, first insert carries the column") {
    val (store, path) = freshStore()
    assert(store.addColumn("tier", LongType) === 1L,
      "a fresh store's first commit may be the schema commit")
    assert(store.currentVersion() === 1L)
    assert(store.all().count() === 0L &&
      store.all().columns.contains("tier"))
    store.insertNew(Ingest.enrich(rows(1L to 3L)).withColumn("tier", col("id")))
    assert(store.currentVersion() === 2L)
    assert(store.all().filter(col("tier") === col("id")).count() === 3L,
      "the first data commit must carry the pre-data evolved column")
    // connector read agrees
    val conn = spark.read.format("graft-store").option("path", path).load()
    assert(conn.filter(col("tier").isNotNull).count() === 3L)
  }

  test("mergeEvolve auto-adds unknown batch columns, lands values, and rejects bad types pre-commit") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 6L)))                        // v1
    // batch: ids 1-2 differ ONLY in the new column; 21 is fresh.
    val batch = Ingest.enrich(rows(Seq(1L, 2L, 21L)))
      .withColumn("tier", col("id") % 2)
    val r = store.mergeEvolve(batch)                                      // v2 ADD + v3 merge
    assert((r.nUpdated, r.nInserted, r.nUnchanged) === ((2L, 1L, 0L)),
      "an evolved-only difference must mark its row updated")
    assert(store.currentVersion() === 3L)
    assert(store.tableSchema("tier").dataType === LongType)
    assert(store.all().filter(col("tier").isNotNull).count() === 3L)
    assert(store.all().filter(col("tier").isNull).count() === 4L)
    // idempotent: the same batch is now all-identical, no new column
    val r2 = store.mergeEvolve(batch)
    assert((r2.nUpdated, r2.nUnchanged) === ((0L, 3L)))
    assert(store.currentVersion() === 3L,
      "an all-unchanged mergeEvolve must not commit data or schema")
    // an unsupported type fails BEFORE any schema commit — even when a
    // second, valid column rides the same batch
    val vBefore = store.currentVersion()
    intercept[IllegalArgumentException] {
      store.mergeEvolve(batch
        .withColumn("ok_col", lit("x"))
        .withColumn("bad_col", array(lit(1))))
    }
    assert(store.currentVersion() === vBefore &&
      !store.tableSchema.fieldNames.contains("ok_col"),
      "a rejected mergeEvolve must leave the schema fully unevolved")
  }

  test("evolved rows survive the ack's file-level rewrite and compaction") {
    val (store, _) = freshStore()
    store.insertNew(Ingest.enrich(rows(1L to 10L)))
    store.addColumn("loyalty_tier", LongType)
    store.insertNew(Ingest.enrich(rows(Seq(500L))).withColumn("loyalty_tier", lit(3L)))
    store.markUploaded(Seq("u500@example.com", "u4@example.com").toDF("email"))
    val acked = store.all().filter(col("uploaded"))
    assert(acked.count() === 2L)
    assert(acked.filter(col("id") === 500L)
      .select("loyalty_tier").head().getLong(0) === 3L,
      "ack rewrite dropped an evolved value")
    store.compact()
    assert(store.all().filter(col("loyalty_tier") === 3L).count() === 1L,
      "compaction dropped an evolved value")
    assert(store.all().filter(col("loyalty_tier").isNull).count() === 10L)
  }
}
