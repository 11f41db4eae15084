package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.util.IndexStore

/** Index lifecycle under deletion: the persisted phrase-search
  * artifacts must keep serving after docs are tombstoned WITHOUT a
  * rebuild (merge-on-read anti-join at probe time), and the compaction
  * op must physically drop every dead posting so post-compaction
  * serving needs no tombstone join. Cross-engine correctness of both
  * legs is the oracle's job (both hash-gate against the same live-docs
  * recompute); this spec pins the PHYSICAL claims the oracle can't
  * see: artifact untouched, dead postings really gone, legs identical.
  */
class IndexLifecycleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  private def loadArtifact(name: String) =
    IndexStore.loadOrBuild(spark, sf, name)(
      throw new AssertionError(s"artifact $name absent — build order broken"))

  test("tombstoned probe serves from the existing index without rebuilding it") {
    run("text_search_phrase").collect(): Unit // build the index group
    val mt0 = IndexStore.artifactMtime(sf, "search_postings_pos")
    assert(mt0.nonEmpty, "postings artifact missing after the build query")
    val out = run("text_search_phrase_tombstoned").collect()
    assert(out.nonEmpty, "tombstoned probe returned nothing")
    assert(IndexStore.artifactMtime(sf, "search_postings_pos") === mt0,
      "serving deletes must not rebuild the postings index")
    // No tombstoned doc may leak through the merge-on-read probe.
    assert(!out.exists(r => r.getAs[Long]("doc_id") % 7 == 2),
      "a tombstoned doc leaked through the anti-join probe")
  }

  test("compaction physically drops every dead posting, and the legs agree") {
    run("text_search_phrase").collect(): Unit
    val full = loadArtifact("search_postings_pos")
    val nDead = full.filter(col("doc_id") % 7 === 2).count()
    assert(nDead > 0, "fixture has no dead postings — the gate would be vacuous")
    val compactedOut = run("text_search_phrase_compacted").collect()
    val compact = loadArtifact("search_postings_pos_compact_m7")
    assert(compact.filter(col("doc_id") % 7 === 2).count() === 0L,
      "compacted index still holds postings of tombstoned docs")
    assert(compact.count() === full.count() - nDead,
      "compaction dropped live postings (or kept dead ones)")
    // Merge-on-read and compacted serving must be indistinguishable —
    // the local half of the rebuild-parity contract (the cross-engine
    // half is both legs hash-gating against the same oracle).
    val tombstonedOut = run("text_search_phrase_tombstoned").collect()
    assert(compactedOut.toSeq === tombstonedOut.toSeq,
      "compacted probe diverged from the merge-on-read probe")
  }

  // The IVF (vector) index under the same lifecycle: postings artifact
  // name mirrors Similarity's private constants (lists=32, iters=2,
  // assign_r=2) — a constant change there breaks these loads loudly.
  private val ivfPostings = "ivf_postings_l32r2a2"

  test("IVF tombstoned probe serves without rebuild and never returns a dead vector") {
    run("sim_ivf_ann").collect(): Unit // build + persist the index group
    val mt0 = IndexStore.artifactMtime(sf, ivfPostings)
    assert(mt0.nonEmpty, "IVF postings artifact missing after the build query")
    val out = run("sim_ivf_tombstoned").collect()
    assert(out.nonEmpty, "tombstoned IVF probe returned nothing")
    assert(IndexStore.artifactMtime(sf, ivfPostings) === mt0,
      "serving deletes must not rebuild the IVF index")
    assert(!out.exists(r => r.getAs[Long]("neighbor_id") % 9 == 4),
      "a tombstoned vector surfaced as a neighbor")
  }

  test("composed lifecycle reuses every persisted artifact on re-run and respects re-insert semantics") {
    val v1 = "ivf_lc_post_l32r2a2_v1"
    val out1 = run("sim_ivf_lifecycle").collect()
    assert(out1.nonEmpty, "lifecycle probe returned nothing")
    val mts = Seq(v1, v1 + "_compact_m9", v1 + "_v4",
        "ivf_lc_postings_l32r2a2", "ivf_lc_centroids_l32r2")
      .map(n => n -> IndexStore.artifactMtime(sf, n)).toMap
    assert(mts.values.forall(_.nonEmpty), s"missing lifecycle artifacts: $mts")
    // Second run: every stage must LOAD, not rebuild (the query's own
    // REQUIREs re-check recall and rebuild parity against the loads).
    val out2 = run("sim_ivf_lifecycle").collect()
    assert(out2.toSeq === out1.toSeq, "lifecycle probe unstable across runs")
    mts.foreach { case (n, mt) =>
      assert(IndexStore.artifactMtime(sf, n) === mt,
        s"re-running the lifecycle rebuilt artifact $n")
    }
    // Physical claims: the compacted artifact holds no tombstoned
    // pre-delete vector; the v4 artifact DOES hold post-delete
    // arrivals with %9=4 (a delete never shadows later inserts).
    val compact = loadArtifact(v1 + "_compact_m9")
    assert(compact.filter(col("vec_id") % 9 === 4).count() === 0L,
      "compacted lifecycle postings still hold tombstoned vectors")
    val v4 = loadArtifact(v1 + "_v4")
    assert(v4.filter(col("vec_id") % 9 === 4 && col("vec_id") % 10 === 7).count() > 0L,
      "post-delete arrivals with the tombstone residue are missing — " +
        "the delete wrongly shadowed later inserts")
    assert(v4.filter(col("vec_id") % 9 === 4 && col("vec_id") % 10 =!= 7).count() === 0L,
      "pre-delete tombstoned vectors leaked into the composed postings")
  }

  test("IVF compaction drops every dead posting, and the legs agree") {
    run("sim_ivf_ann").collect(): Unit
    val full = loadArtifact(ivfPostings)
    val nDead = full.filter(col("vec_id") % 9 === 4).count()
    assert(nDead > 0, "fixture has no dead postings — the gate would be vacuous")
    val compactedOut = run("sim_ivf_compacted").collect()
    val compact = loadArtifact(ivfPostings + "_compact_m9")
    assert(compact.filter(col("vec_id") % 9 === 4).count() === 0L,
      "compacted IVF index still posts tombstoned vectors")
    assert(compact.count() === full.count() - nDead,
      "IVF compaction dropped live postings (or kept dead ones)")
    val tombstonedOut = run("sim_ivf_tombstoned").collect()
    assert(compactedOut.toSeq === tombstonedOut.toSeq,
      "compacted IVF probe diverged from the merge-on-read probe")
  }
}
