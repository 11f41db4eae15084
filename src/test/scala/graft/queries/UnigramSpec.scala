package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM trainer invariants. Numeric exactness against an
  * independent implementation is the driver's DuckDB oracle
  * (text_unigram_train); this spec pins the structural contract and
  * that the trainer actually discovers multi-character units on a
  * corpus built to reward them.
  */
class UnigramSpec extends SparkSpec {

  private def fixture(docs: Seq[String]): String = {
    import spark.implicits._
    val dir = tmpDir("unigram")
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("vocab contract: ranks contiguous, pieces distinct and bounded") {
    val dir = fixture(Seq.fill(5)("the quick brown fox jumps over the lazy dog"))
    val rows = UnigramLm.train(spark, dir).head
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === (1L to rows.length))
    assert(rows.map(_._2).distinct.length === rows.length)
    assert(rows.forall { case (_, p, _) =>
      p.nonEmpty && p.length <= UnigramLm.UNI_MAXP && p.forall(c => c >= 'a' && c <= 'z') })
    assert(rows.forall(_._3 > 0))
    // n_uses non-increasing with rank; ties broken by piece ascending
    assert(rows.toSeq.sliding(2).forall {
      case Seq((_, p1, u1), (_, p2, u2)) => u1 > u2 || (u1 == u2 && p1 < p2)
      case _ => true
    })
  }

  test("trainer discovers multi-char pieces on a unit-heavy corpus") {
    // 'ab' dominates: words are ab-repeats, so single chars a/b always
    // have a cheaper 'ab'-segmentation available once 'ab' is seeded.
    val dir = fixture(Seq.fill(20)("abab abab ababab xy") ++ Seq("q w e r t"))
    val rows = UnigramLm.train(spark, dir).head
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val multi = rows.filter(_._1.length > 1)
    assert(multi.nonEmpty, s"no multi-char piece trained: ${rows.mkString(",")}")
    assert(rows.take(3).exists(_._1.contains("ab")),
      s"'ab' family missing from the top: ${rows.take(5).mkString(",")}")
    // single chars that only appear inside merged units get no uses —
    // the prune step: 'a' must not outrank the unit that covers it
    val uses = rows.toMap
    assert(uses.getOrElse("a", 0L) < uses.filter(_._1.contains("ab")).values.max)
  }

  test("training is deterministic across runs") {
    val dir = fixture(Seq.fill(3)("some words repeat some words differ here"))
    val a = UnigramLm.train(spark, dir).head.collect().toSeq
    val b = UnigramLm.train(spark, dir).head.collect().toSeq
    assert(a === b)
  }

  test("segmentation artifact covers every trainable word with sane piece counts") {
    val dir = fixture(Seq.fill(10)("abab abab ababab xy") ++ Seq("q w e r t"))
    val Seq(_, seg) = UnigramLm.train(spark, dir)
    val rows = seg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Every distinct trainable word is segmented exactly once.
    val words = Set("abab", "ababab", "xy", "q", "w", "e", "r", "t")
    assert(rows.keySet === words, s"segmented ${rows.keySet}")
    rows.foreach { case (w, np) =>
      // np bounded by [ceil(len/maxPiece), len] — fewer pieces than the
      // coarsest cover or more than the char count is impossible.
      val lo = (w.length + UnigramLm.UNI_MAXP - 1) / UnigramLm.UNI_MAXP
      assert(np >= lo && np <= w.length, s"$w segmented into $np pieces")
    }
    // The unit-heavy words segment via the discovered 'ab' pieces, so
    // strictly fewer pieces than characters.
    assert(rows("abab") < 4 && rows("ababab") < 6)
  }
}
