package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE merge training: greedy-overlap application semantics and the
  * end-to-end merge table contract.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  private def symTable(words: (String, Long)*) = {
    import spark.implicits._
    words.toSeq.toDF("w", "freq")
      .selectExpr("w", "freq", "explode(sequence(1, length(w))) AS pos")
      .selectExpr("w", "freq", "pos", "substring(w, pos, 1) AS sym")
  }

  private def reassemble(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.collect().groupBy(_.getAs[String]("w"))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("sym")).toSeq
      }

  test("applyMerge is greedy left-to-right on overlapping runs (l = r)") {
    // "aaaa" → (aa)(aa); "aaa" → (aa)a; "aabaaa" → (aa)b(aa)a — a
    // sequential scanner's output exactly.
    val merged = reassemble(
      BpeTraining.applyMerge(symTable("aaaa" -> 1L, "aaa" -> 1L, "aabaaa" -> 1L), "a", "a"))
    assert(merged("aaaa") === Seq("aa", "aa"))
    assert(merged("aaa") === Seq("aa", "a"))
    assert(merged("aabaaa") === Seq("aa", "b", "aa", "a"))
  }

  test("applyMerge only touches adjacent (l, r) in order") {
    // "abab" with merge (a,b) → (ab)(ab); "ba" untouched.
    val merged = reassemble(
      BpeTraining.applyMerge(symTable("abab" -> 1L, "ba" -> 1L), "a", "b"))
    assert(merged("abab") === Seq("ab", "ab"))
    assert(merged("ba") === Seq("b", "a"))
  }

  test("text_bpe_merges emits BPE_MERGES rounds with non-increasing counts") {
    val rows = graft.SparkEntry.queries("text_bpe_merges")(spark, sf).collect()
    assert(rows.length === BpeTraining.BPE_MERGES)
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq ===
      (1L to BpeTraining.BPE_MERGES.toLong))
    // A merge can only create pairs no more frequent than the pair it
    // merged, and existing pair counts never grow — so the argmax
    // sequence is non-increasing.
    val counts = rows.sortBy(_.getAs[Long]("merge_rank")).map(_.getAs[Long]("pair_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: ${counts.mkString(",")}")
    // Every merged symbol is built from [a-z] chars and at most one
    // end-of-word marker.
    rows.foreach { r =>
      val pair = r.getAs[String]("lhs") + r.getAs[String]("rhs")
      assert(pair.replace(BpeTraining.EOW, "").forall(c => c >= 'a' && c <= 'z'))
    }
  }
}
