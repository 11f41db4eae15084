package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis built entirely from codegen'd built-ins
  * (no UDFs), so every operator stays inside whole-stage codegen and the
  * same semantics are expressible in the DuckDB oracle SQL.
  *
  * Generalizes the reference's validation surface (csv-crm-upload does only
  * an int-cast and an empty-string check, `cmd/csvreader/csvreader.go:120-127`)
  * into the text-quality operators a training-data pipeline needs.
  */
object TextFunctions {

  /** Whitespace-normalized text: trim + collapse runs of whitespace. */
  // Explicit class, not \s: Java \s includes \x0B, RE2 (DuckDB) does
  // not — the explicit class is RE2's \s, keeping both engines exact.
  def normText(c: Column): Column = regexp_replace(trim(c), "[ \\t\\n\\f\\r]+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct word n-gram shingles over a token array. Safe on short
    * docs (fewer than n tokens → empty array, not a descending sequence).
    */
  def wordShingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Count of tokens that appear in a fixed marker set. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers.map(lit))))
      .cast("long")

  /** Language-ID marker lexicons — tiny, disjoint, deterministic. A real
    * system would use char-n-gram profiles; the *operator shape* (score
    * per language, argmax with fixed priority, 'und' when no evidence) is
    * what matters and is shared with the oracle SQL.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "das", "ist", "mit"),
    "fr" -> Seq("le", "les", "est", "avec", "dans"),
    "es" -> Seq("el", "los", "es", "con", "para"),
    "zh" -> Seq("的", "是", "在"))

  /** Predicted language: argmax of marker hits with ties broken by the
    * declaration order above; 'und' when nothing matched.
    */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, m) => lang -> markerHits(toks, m) }
    val langs = scores.map(_._1)
    // lang wins if its score is positive and >= all later languages'
    // scores (earlier languages already had their chance in the chain).
    val cases = langs.zipWithIndex.map { case (lang, i) =>
      val mine = scores(i)._2
      val beatsRest = scores.drop(i + 1)
        .map { case (_, s) => mine >= s }
        .foldLeft(lit(true))(_ && _)
      (mine > 0 && beatsRest, lit(lang))
    }
    cases.foldRight(lit("und")) { case ((cond, v), acc) => when(cond, v).otherwise(acc) }
  }

  /** Ratio of non-alphanumeric-non-space chars to total chars (0 when
    * empty). Stripping [a-zA-Z0-9 ] leaves exactly the punctuation chars.
    */
  def punctRatio(norm: Column): Column = {
    val n = length(norm)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(norm, "[a-zA-Z0-9 ]", "")).cast("double") / n.cast("double"))
  }

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that")

  /** Ratio of stopword tokens to all tokens (0 when no tokens). */
  def stopwordRatio(toks: Column): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(markerHits(toks, stopwords).cast("double") / n.cast("double"))
  }

  /** Mean token length in characters. */
  def avgTokenLen(norm: Column, toks: Column): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0)).otherwise(
      (length(norm) - n + 1).cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * mid-range doc length, penalizes punctuation noise. Deterministic
    * double arithmetic, mirrored exactly in the oracle SQL.
    */
  def qualityScore(norm: Column, toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / lit(64.0), lit(1.0))
    val stopScore = least(stopwordRatio(toks) * lit(4.0), lit(1.0))
    val punctPenalty = least(punctRatio(norm) * lit(4.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.4) * stopScore + lit(0.2) * (lit(1.0) - punctPenalty)
  }

  /** BPE-ish token count estimate: word tokens plus an extra token per 4
    * chars of long words (subword splits), a standard cheap proxy.
    */
  def tokenEstimate(norm: Column, toks: Column): Column =
    (size(toks) + size(filter(toks, t => length(t) > 8))).cast("long")

  /** Stable content fingerprint for exact dedup: md5 of normalized text
    * (md5 exists in both Spark and DuckDB → oracle-able).
    */
  def contentFingerprint(c: Column): Column = md5(normText(c))

  /** The ONE train/eval split rule (7/8 vs 1/8: first fingerprint hex
    * digit in {e,f} → eval). Shared by the splitter query and the
    * decontamination check — if these ever diverged, the leakage check
    * would silently validate against a split training doesn't use.
    * SQL mirror: [[trainEvalSplitSql]].
    */
  def trainEvalSplit(text: Column): Column =
    when(substring(contentFingerprint(text), 1, 1).isin("e", "f"), "eval")
      .otherwise("train")

  /** DuckDB form of [[trainEvalSplit]] over a md5-hex expression. */
  def trainEvalSplitSql(md5Expr: String): String =
    s"CASE WHEN substr($md5Expr, 1, 1) IN ('e','f') THEN 'eval' ELSE 'train' END"

  /** DuckDB mirrors of [[normText]]/[[tokens]] — the ONE definition
    * every oracle shares, so the engine-exact whitespace semantics
    * (DuckDB regexp_replace needs the 'g' flag; string_split on a
    * single space after normalization) can never desynchronize
    * between query modules.
    */
  val normSql: String = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
  val toksSql: String = s"string_split($normSql, ' ')"

  /** DuckDB mirror of [[qualityScore]], floor-quantized to ppm — the
    * ONE textual definition of the composite quality formula. Callers
    * supply the token-count / stopword-ratio / punct-ratio SQL
    * expressions (pre-parenthesized if compound); the arithmetic and
    * its IEEE op order live only here, so the label every consumer
    * derives (text_quality, the classifier's y, the curation bands)
    * can never drift between copies.
    */
  def qualityPpmSqlFrom(nToksExpr: String, stopRatioExpr: String,
      punctRatioExpr: String): String =
    s"""CAST(floor((0.4 * least(CAST($nToksExpr AS DOUBLE) / 64.0, 1.0)
          + 0.4 * least($stopRatioExpr * 4.0, 1.0)
          + 0.2 * (1.0 - least($punctRatioExpr * 4.0, 1.0))) * 1000000.0) AS BIGINT)"""
}
