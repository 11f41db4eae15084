package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group Bloom bitset as a dense word array (r16 optimization
  * round): each input row carries its PRE-COMPUTED bit positions (the
  * same `pmod(xxhash64(email, seed), nbits)` expressions the manifest
  * contract has always used — computed once, outside the aggregator, so
  * the bits are bit-identical to the old explode + bit_or plan), and
  * the aggregate ORs them into `nbits/64` words. Replaces a second
  * shuffle stage per commit (explode ×seeds → groupBy(file, word)) with
  * map-side partials inside the SAME per-file aggregate that computes
  * the zone stats (guide §2.3 "aggregate before you shuffle", §2.4
  * "remove shuffles outright").
  *
  * Determinism: bitwise OR is associative, commutative and idempotent,
  * so the result is independent of partitioning and merge order. State
  * is nbits/8 bytes per group (16 KiB at the store's 2^17 default) —
  * manifest-sized, never row-sized.
  */
class BloomWordsAggregator(nbits: Long)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private val nWords: Int = ((nbits + 63) / 64).toInt

  override def zero: Array[Long] = new Array[Long](nWords)

  override def reduce(b: Array[Long], positions: Seq[Long]): Array[Long] = {
    val it = positions.iterator
    while (it.hasNext) {
      val p = it.next()
      b((p >>> 6).toInt) |= 1L << (p & 63)
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(r)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
