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

  /** 8-bit bands of a 64-bit simhash for pigeonhole blocking: any pair
    * at hamming distance ≤ 7 must agree on at least one of the 8 bands,
    * so joining on (band, value) is an EXACT blocking scheme for d ≤ 7,
    * not an approximation. Static shifts over an already-materialized
    * long — pure codegen'd bit math.
    */
  def simHashBands(sig: Column): Column =
    array((0 until 8).map(b =>
      shiftright(sig, b * 8).bitwiseAND(lit(255L))): _*)
}
