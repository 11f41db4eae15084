package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Depth proof for BPE training: the oracle gates 8 rounds (CTE-chain
  * tractability), production runs thousands — this spec runs 128
  * rounds at sf0.01 and pins the two claims that make depth safe:
  *
  *  1. per-round cost stays FLAT (the vocabulary-bounded claim,
  *     BpeTraining scaladoc): each round runs over the distinct-word
  *     symbol table, which only SHRINKS as merges land, so late rounds
  *     must not cost more than early ones;
  *  2. deeper training EXTENDS the model — the first 8 merges of the
  *     128-round table are exactly the oracle-checked 8-round table
  *     (greedy BPE's argmax at round i does not depend on rounds > i).
  */
class BpeDepthSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val DEPTH = 128

  test(s"$DEPTH merge rounds: flat per-round cost, 8-round table is a prefix") {
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val times = Array.ofDim[Double](DEPTH)
    val (mergesDf, segDf) = BpeTraining.train(spark, sf, DEPTH,
      (round, sec) => times(round - 1) = sec)
    val merges = mergesDf.orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // The sf0.01 [a-z]+ vocabulary exhausts its pair space at ~106
    // merges (every word fully merged into one symbol) — the
    // vocabulary-bounded endpoint itself. Require the run to get deep
    // (≫ the 8-round oracle) before exhausting.
    val nMerged = merges.length
    info(s"$nMerged merges landed before pair-space exhaustion")
    assert(nMerged >= 64, s"pair space exhausted early: only $nMerged merges")

    // 2. Prefix property vs the driver-gated 8-round model.
    val oracle8 = SparkEntry.queries("text_bpe_merges")(spark, sf)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.take(oracle8.length).toSeq === oracle8.toSeq,
      "deep training must extend, not rewrite, the oracle-checked table")

    // 1. Flatness over the rounds that actually merged (post-
    // exhaustion rounds are near-free and would flatter the stat),
    // skipping the first 8 (codegen/JIT warmup lands there). A
    // per-round blowup (e.g. unbounded lineage) shows up as a
    // multiple, not a few percent, so the 3x bound is loose to
    // co-running-JVM noise yet far below any real growth curve.
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val early = median(times.slice(8, 40).toSeq)
    val late = median(times.slice(nMerged - 32, nMerged).toSeq)
    info(f"per-round cost: early median $early%.3fs, late median $late%.3fs")
    assert(late <= early * 3.0,
      f"late rounds cost ${late / early}%.1fx early rounds — per-round cost not flat")

    // The symbol table can only shrink: every landed merge removes one
    // symbol per application site and adds none.
    val finalSegs = segDf.agg(org.apache.spark.sql.functions.sum("n_sub"))
      .head().getLong(0)
    assert(finalSegs > 0)
  }
}
