package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass JVM kernels behind the custom Catalyst expressions in
  * [[Exprs]]. Why these exist: composing minhash/simhash out of Spark's
  * higher-order functions re-evaluates the captured child expression per
  * lambda element (`transform(sequence(0,127), i -> f(tokens(text)))`
  * tokenizes the document 128 times — observed as a ~100× slowdown), and
  * HOFs sit outside whole-stage codegen anyway. A single expression that
  * does tokenize→shingle→hash→sketch in one pass over the string is both
  * the fastest and the idiomatic-Spark way to add an operator Catalyst
  * lacks (custom Expression with doGenCode, per the preference order:
  * built-ins > custom Expression > UDF).
  *
  * All hashing is xxhash64 (Spark's own XXH64), so results are
  * deterministic across JVMs/executors — required for shuffle-stable
  * LSH band joins.
  */
object TextKernels {

  private val HASH_SEED = 42L

  /** Whitespace tokens of the trimmed text; matches
    * split(regexp_replace(trim(text), '\s+', ' '), ' ') exactly,
    * including the single-empty-token result for blank input and the
    * empty edge tokens when the text starts/ends with NON-SPACE
    * whitespace: SQL trim strips only ' ', so a leading tab survives
    * the trim, collapses to ' ', and splits into a leading "" token.
    * (Java String.trim strips every char ≤ U+0020 and would silently
    * drop those tokens — KernelsSpec pins the divergence.)
    */
  def tokens(text: UTF8String): Array[String] = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    // Explicit class, not \s: Java \s includes \x0B (vertical tab),
    // RE2 — the oracle's regex engine — does not. The explicit class
    // is RE2's \s, so both engines split identically.
    s.substring(b, e).split("[ \\t\\n\\f\\r]+", -1)
  }

  private def xx(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, HASH_SEED)
  }

  /** Distinct word n-gram shingles as strings, first-occurrence order —
    * set-equal to the HOF/SQL formulation
    * `list_distinct([w[i]||' '||w[i+1]||...])` used by the DuckDB oracle.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingle hashes (full 64-bit). */
  private def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokens(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.HashSet[Long]()
    val out = new Array[Long](toks.length - n + 1)
    var m = 0
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h = xx(sb.toString)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  // Per-permutation rehash MUST be a real scramble (xxhash of the base
  // hash, seeded by the permutation index). The affine family
  // (a_i*h+b_i mod M) tried first keeps the 128 minima correlated —
  // monotone-ish maps of the same base hash pick the same argmin — so
  // LSH bands missed together: observed 8/256 true pairs lost at sf0.1.

  /** MinHash signature (length k) + LSH banding (k/bands rows per band)
    * in one pass. Returns the band hashes (array<long>, length `bands`);
    * empty shingle set → per-band sentinel hashes of Long.MaxValue
    * minima (identical for all empty docs — they are legitimately
    * candidate pairs: two empty docs ARE duplicates).
    */
  def minhashBands(text: UTF8String, n: Int, k: Int, bands: Int): ArrayData = {
    val hs = shingleHashes(text, n)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var si = 0
    while (si < hs.length) {
      val h = hs(si)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      si += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = HASH_SEED
      var j = 0
      while (j < r) { acc = XXH64.hashLong(sig(b * r + j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token) as a big-endian long — bit-identical
    * to DuckDB's ('0x' || substr(md5(t),1,16))::UBIGINT, which is what
    * makes the simhash signature reproducible by the SQL oracle
    * (xxhash64 does not exist in DuckDB). Hashing is not the simhash
    * bottleneck — the band join is (SCALING.md) — so the cryptographic
    * hash costs nothing measurable while buying cross-engine checks.
    */
  private def md5Hash64(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over whitespace tokens: per bit, majority vote of
    * token-hash bits (ties → 0). Token hash is md5-derived so the
    * DuckDB oracle can recompute the signature exactly.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = md5Hash64(toks(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Character-diversity stats over the string's code points:
    * `[n_distinct_chars, top_char_count, collision_mass Σc²]` in one
    * pass. The `aggregate` HOF fold this replaces evaluated
    * interpreted with a struct allocation per CHARACTER (the
    * per-element trap this file documents, at its finest granularity)
    * and broke the stage's codegen span; the kernel is one static
    * call inside it. Counts are order-independent, so the result is
    * deterministic under any iteration order (the map is only
    * iterated for commutative reductions).
    */
  def charStats(s: UTF8String): ArrayData = {
    val str = s.toString
    // ASCII counts in a primitive array (the dominant case — zero
    // allocation per character); only non-ASCII code points take the
    // boxed-map path.
    val ascii = new Array[Long](128)
    var overflow: java.util.HashMap[Integer, java.lang.Long] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      if (cp < 128) ascii(cp) += 1
      else {
        if (overflow == null) overflow = new java.util.HashMap
        overflow.merge(cp, 1L, (a, b) => a + b)
      }
    }
    var nd = 0L
    var best = 0L
    var sumsq = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { nd += 1; if (c > best) best = c; sumsq += c * c }
      j += 1
    }
    if (overflow != null) {
      val it = overflow.values().iterator()
      while (it.hasNext) {
        val c: Long = it.next()
        nd += 1
        if (c > best) best = c
        sumsq += c * c
      }
    }
    new GenericArrayData(Array(nd, best, sumsq))
  }

  /** FNV-1a 64-bit content fingerprint over the raw UTF-8 bytes — a
    * cheap, codegen-friendly rolling hash for exact-dup bucketing where
    * a cryptographic md5 would be overkill.
    */
  def fingerprint64(text: UTF8String): Long = {
    val bytes = text.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
