package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch-based near-dup helpers that are cheap enough to stay as
  * built-in column math. The heavy one-pass sketches (minhash banding,
  * simhash, shingling) are custom Catalyst expressions in [[Exprs]] —
  * see TextKernels for why HOF compositions were rejected.
  */
object MinHash {

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** 16-bit bands of a 64-bit simhash for pigeonhole blocking: any pair
    * at hamming distance ≤ 3 must agree on at least one of the 4 bands,
    * so joining on (band, value) is an EXACT blocking scheme for d ≤ 3
    * (the conventional simhash dedup radius), not an approximation.
    * Band width is the scale dial: 8-bit bands (d ≤ 7) have only 256
    * values per band, so bucket sizes — and the candidate join — grow
    * linearly with corpus size (measured 10× slower at 10× docs);
    * 16-bit bands keep buckets near-singleton until ~10^6 docs per
    * partition-disjoint shard. Static shifts over a materialized long —
    * pure codegen'd bit math.
    */
  def simHashBands(sig: Column): Column =
    array((0 until 4).map(b =>
      shiftright(sig, b * 16).bitwiseAND(lit(65535L))): _*)
}
