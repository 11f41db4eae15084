package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class KernelsSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("kernel shingles are set-equal to the HOF/SQL formulation") {
    import spark.implicits._
    val docs = Seq(
      "a b c d e", "one two", "", "  padded   text  here now ",
      "x x x x x", "alpha beta gamma delta",
      // Leading/trailing NON-SPACE whitespace: SQL trim strips only
      // spaces, so these must produce the same (empty-edge-token)
      // shingle sets in both formulations — Java String.trim would not.
      "\tlead tab doc one two", "trail newline doc one two\n",
      "\n\t mixed ws doc one two \t").toDF("text")
    val both = docs.select(
      Exprs.shingles(col("text"), 3).as("kernel"),
      TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0).toSet === r.getSeq[String](1).toSet)
    }
  }

  test("kernel tokens match the SQL trim semantics for tab/newline edges") {
    // trim(' x\t') strips the space but not the tab: the SQL pipeline
    // collapses "\t" to " " and splits into an empty trailing token.
    assert(TextKernels.tokens(u(" x\t")).toSeq === Seq("x", ""))
    assert(TextKernels.tokens(u("\tx")).toSeq === Seq("", "x"))
    assert(TextKernels.tokens(u("\na b\r\n")).toSeq === Seq("", "a", "b", ""))
    assert(TextKernels.tokens(u("  a  b  ")).toSeq === Seq("a", "b"))
    assert(TextKernels.tokens(u("")).toSeq === Seq(""))
    assert(TextKernels.tokens(u("   ")).toSeq === Seq(""))
    // \x0B (vertical tab) is whitespace to Java's \s but NOT to RE2 —
    // the oracle's engine — so it must stay inside the token.
    assert(TextKernels.tokens(u("a\u000Bb c")).toSeq === Seq("a\u000Bb", "c"))
  }

  test("simhash: identical docs collide, near-dups are close, disjoint docs are far") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words about database engines and query planners"
    val h1 = TextKernels.simhash64(u(base))
    val h2 = TextKernels.simhash64(u(near))
    val h3 = TextKernels.simhash64(u(far))
    assert(TextKernels.simhash64(u(base)) === h1) // deterministic
    assert(java.lang.Long.bitCount(h1 ^ h2) < java.lang.Long.bitCount(h1 ^ h3))
  }

  test("minhash bands: duplicates share all bands, near-dups share some, disjoint none") {
    def bands(s: String): Seq[Long] = {
      val a = TextKernels.minhashBands(u(s), 3, 128, 64)
      (0 until a.numElements()).map(a.getLong)
    }
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 37) "CHANGED" else s"tok$i").mkString(" ")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val (b1, b2, b3) = (bands(doc), bands(near), bands(far))
    assert(b1 === bands(doc))
    val sharedNear = b1.zip(b2).count { case (x, y) => x == y }
    val sharedFar = b1.zip(b3).count { case (x, y) => x == y }
    assert(sharedNear > 30, s"near-dup shared only $sharedNear/64 bands")
    assert(sharedFar === 0)
  }

  test("fingerprint64 is deterministic and content-sensitive") {
    assert(TextKernels.fingerprint64(u("abc")) === TextKernels.fingerprint64(u("abc")))
    assert(TextKernels.fingerprint64(u("abc")) !== TextKernels.fingerprint64(u("abd")))
  }

  test("dotLong kernel matches naive dot product") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    val got = df.select(Exprs.dotLong(col("a"), col("b"))).head().getLong(0)
    assert(got === 32L)
  }

  test("langId picks the marker-dominant language and falls back to und") {
    import spark.implicits._
    val df = Seq(
      "the cat and the hat is happy",
      "der hund und das haus ist hier",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextFunctions.langId(TextFunctions.tokens(col("text"))))
      .collect().map(_.getString(0))
    assert(got === Array("en", "de", "und"))
  }

  test("charStats kernel matches the naive per-codepoint count on seeded inputs") {
    def naive(s: String): (Long, Long, Long) = {
      val counts = s.codePoints().toArray.groupBy(identity)
        .map { case (_, v) => v.length.toLong }
      if (counts.isEmpty) (0L, 0L, 0L)
      else (counts.size.toLong, counts.max, counts.map(c => c * c).sum)
    }
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefg 的是在日本語x0189😀" // incl. an astral emoji
    val cases = Seq("", "a", "aaaa", "的的的 a") ++
      (1 to 60).map(_ => (1 to rng.nextInt(120))
        .map(_ => alphabet.charAt(rng.nextInt(alphabet.length))).mkString
        // Random char picks can split the emoji's surrogate pair; drop
        // unpaired surrogates so every case is a valid codepoint
        // sequence (the astral path is pinned separately below).
        .filter(c => !Character.isSurrogate(c)))
    cases.foreach { s =>
      val got = TextKernels.charStats(u(s))
      val (nd, best, sumsq) = naive(s)
      assert(got.getLong(0) === nd, s"nd mismatch on '$s'")
      assert(got.getLong(1) === best, s"best mismatch on '$s'")
      assert(got.getLong(2) === sumsq, s"sumsq mismatch on '$s'")
    }
    // The astral pair counts as ONE codepoint, not two chars.
    val emoji = TextKernels.charStats(u("😀😀"))
    assert(emoji.getLong(0) === 1L && emoji.getLong(1) === 2L)
  }
}
