package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for the typed top-k Aggregator: ordering (value
  * DESC, id ASC tie-break), bounded buffer, merge associativity /
  * commutativity, and the Long.MinValue edge the negation-based
  * ordering it replaced got wrong.
  */
class TopKSpec extends AnyFunSuite {

  private val agg = new TopKAggregator(3)

  private def reduceAll(rows: Seq[(Long, Long)]): Seq[(Long, Long)] =
    agg.finish(rows.foldLeft(agg.zero)(agg.reduce))

  test("keeps the k largest values with id as tie-break") {
    val rows = Seq((5L, 9L), (7L, 2L), (5L, 1L), (3L, 4L), (7L, 8L))
    assert(reduceAll(rows) === Seq((7L, 2L), (7L, 8L), (5L, 1L)))
  }

  test("Long.MinValue never outranks real values (negation overflow edge)") {
    val rows = Seq((Long.MinValue, 1L), (0L, 2L), (-5L, 3L), (Long.MaxValue, 4L))
    assert(reduceAll(rows) === Seq((Long.MaxValue, 4L), (0L, 2L), (-5L, 3L)))
  }

  test("merge is order-independent and agrees with a single reduction") {
    val rows = (1L to 20L).map(i => ((i * 7919) % 13, i))
    val direct = reduceAll(rows)
    for (split <- Seq(1, 5, 10, 19)) {
      val (l, r) = rows.splitAt(split)
      val lb = l.foldLeft(agg.zero)(agg.reduce)
      val rb = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(lb, rb)) === direct)
      assert(agg.finish(agg.merge(rb, lb)) === direct)
    }
  }

  test("groups smaller than k return everything, sorted") {
    assert(reduceAll(Seq((1L, 1L))) === Seq((1L, 1L)))
    assert(reduceAll(Nil) === Nil)
  }
}
