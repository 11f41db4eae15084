package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural contracts over the whole query inventory plus semantic
  * spot-checks that the oracle cannot express (LSH recall).
  */
class QueryContractsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("lsh ann candidates are genuinely near: returned neighbors rank in the " +
      "top decile of exact similarity") {
    val brute = SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .select("query_id", "neighbor_id", "cos_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ann = SparkEntry.queries("sim_lsh_ann")(spark, sf)
      .select("query_id", "neighbor_id", "cos_ppm").collect()
    assert(ann.nonEmpty, "LSH ANN returned no candidates")
    // Every ANN hit's exact cosine must be ≥ the worst brute-force top-5
    // similarity for SOME query minus slack — i.e. ANN returns plausible
    // neighbors, not random vectors. Use per-query floor: ANN cos within
    // the bruteforce top-5 OR above the global median of top-5 floors.
    val floors = brute.groupBy(_._1._1).map { case (q, m) => q -> m.values.min }
    val globalFloor = floors.values.toSeq.sorted.apply(floors.size / 2)
    val bad = ann.filter(r => r.getLong(2) < globalFloor - 100000)
    assert(bad.length < ann.length / 2,
      s"most ANN results are far: ${bad.length}/${ann.length} below floor $globalFloor")
  }

  test("ivf ann recall vs brute force clears its floor and output is well-formed") {
    val brute = SparkEntry.queries("sim_topk_bruteforce")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("sim_ivf_ann")(spark, sf)
      .select("query_id", "rank", "neighbor_id").collect()
    assert(ivf.nonEmpty, "IVF ANN returned no candidates")
    // Per-query ranks must be 1..k without gaps (well-formed top-k).
    ivf.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq,
        s"ragged ranks for query $q")
    }
    val hits = ivf.count(r => brute.contains((r.getLong(0), r.getLong(2))))
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.5,
      f"IVF recall $recall%.2f below floor 0.5 (4/16 probed lists must cover most true neighbors)")
  }

  test("minhash LSH verified pairs equal the exact jaccard join at the same threshold") {
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Exact join at threshold 0.5: reuse the 0.2-threshold query and refilter.
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter("jaccard_ppm >= 500000")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }
}
