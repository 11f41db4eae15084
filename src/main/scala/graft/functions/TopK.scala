package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed [[Aggregator]] (the Dataset UDAF surface — SURVEY §2.3's
  * UDF/UDAF row, complementing the codegen'd scalar Expressions in
  * [[Exprs]]): per-group top-k of (value, id) pairs, ordered value
  * DESC with the id as total-order tie-break.
  *
  * Determinism: the reduction keeps a sorted bounded buffer; merge is
  * associative and commutative over the pair ordering, so the result
  * is independent of partitioning and merge order — the property that
  * lets the DuckDB oracle reproduce it with a plain window. State is
  * O(k) per group; the partial aggregation runs map-side, so the
  * shuffle carries k pairs per (partition, group), not rows — the same
  * scale shape as Spark's own TakeOrderedAndProject, but per group.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  // Pairs are (sortValue, id); larger sortValue wins, smaller id
  // breaks ties. Explicit comparator, not Ordering.by(-v): negation
  // overflows for Long.MinValue and would rank it first.
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val byValue = java.lang.Long.compare(b._1, a._1) // DESC
      if (byValue != 0) byValue else java.lang.Long.compare(a._2, b._2) // id ASC
    }
  }

  override def zero: Seq[(Long, Long)] = Seq.empty

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sorted(ord).take(k)

  /** Per-row path. The buffer is kept sorted (zero is sorted; both
    * producers sort), so a full buffer whose last element outranks the
    * new value short-circuits in O(1), and otherwise an insertion-point
    * scan + patch is O(k) — not the O(k log k) full re-sort per row the
    * trim path pays.
    */
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
    if (b.size >= k && ord.compare(b.last, a) <= 0) return b
    val i = b.indexWhere(e => ord.compare(a, e) < 0) // first element a outranks
    val at = if (i < 0) b.size else i
    ((b.take(at) :+ a) ++ b.drop(at)).take(k)
  }

  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[(Long, Long)]): Seq[(Long, Long)] =
    reduction.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
