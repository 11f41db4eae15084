package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{QueryGroup, Tables}
import graft.functions.Exprs
import graft.functions.TextFunctions._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw ingest and tokenization: PII scrubbing, corpus-common
  * boilerplate measurement, n-gram-LM fluency scoring against the train
  * split, sub-document paragraph dedup, asymmetric containment dedup,
  * rank-based quality banding, char-diversity stats, per-domain
  * document caps, deterministic shard export, and the one-row dataset
  * card a pipeline publishes with a corpus snapshot.
  *
  * Everything is engine-exact: regexes restrict to the Java/RE2 common
  * subset (explicit classes, no lookaround, no escapes that differ),
  * ratios are integer DIV micro-units, and samples/caps key on the
  * content md5 — so the DuckDB oracle replays every operator
  * bit-for-bit (SURVEY.md §8.5 techniques).
  */
object Curation extends QueryGroup {

  /** Java/RE2-common PII patterns: character classes only — `\d`/`\b`
    * semantics differ in corner cases across engines, explicit classes
    * never do.
    */
  private val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Boilerplate = distinct trigrams shared by ≥ BOILER_DF docs. At
    * sf0.01 this splits the gram table ~151 common / ~16k rare — a real
    * corpus would set the threshold as a rate of corpus size; constant
    * here so every SF is deterministic and oracle-able.
    */
  private val BOILER_N = 3
  private val BOILER_DF = 5
  private val FLAG_PPM = 100000L

  private val CAP_K = 15
  private val SHARDS = 8

  /** Sequence-packing geometry: the training sequence length in tokens
    * and the shard fan-out of the pack. Both sides of the oracle are
    * generated from these constants.
    */
  private val PACK_B = 512
  private val PACK_SHARDS = 8
  private val SHUF_EPOCHS = 3
  private val SHUF_SHARDS = 8
  private val SHUF_SEED = "graft"
  private val LM_TOPK = 20

  /** Posting-list df cap for the containment join: grams seen in more
    * docs than this are dropped from candidate generation AND the
    * score definition (a capped gram is stop-gram noise for a
    * containment signal anyway). Above every df at the test SFs; at
    * corpus scale it is the dial that keeps posting lists bounded.
    */
  private val DF_CAP = 1000

  /** Disjoint CHUNK_TOKS-token chunk fingerprints (sub-document dedup
    * granularity — the line/paragraph-dedup analog for documents with
    * no line structure). Trailing sub-chunk tokens are ignored; docs
    * shorter than one chunk contribute nothing.
    */
  private val CHUNK_TOKS = 16
  private def chunkFps(w: Column): Column =
    when(size(w) >= CHUNK_TOKS,
      transform(sequence(lit(0), floor(size(w) / CHUNK_TOKS).cast("int") - 1),
        i => md5(concat_ws(" ", slice(w, i * CHUNK_TOKS + 1, lit(CHUNK_TOKS))))))
      .otherwise(array().cast("array<string>"))

  /** The deterministic PII-injection fixture: the synthetic documents
    * are PII-free word soup, so both engines append the same synthetic
    * email/phone to a doc_id-keyed subset — the injection is the test
    * fixture (like MediaOps.fakeMediaTable), the scrub operator is the
    * real artifact.
    */
  private def rawWithPii: Column = concat(
    col("text"),
    when(col("doc_id") % 3 === 0,
      concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0,
      concat(lit(" call "), (col("doc_id") % 900 + 100).cast("long"), lit("-"),
        (col("doc_id") % 700 + 200).cast("long"), lit("-"),
        (col("doc_id") % 9000 + 1000).cast("long")))
      .otherwise(lit("")))

  private val rawSql: String =
    """text || CASE WHEN doc_id % 3 = 0
      |  THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      ||| CASE WHEN doc_id % 5 = 0
      |  THEN ' call ' || (doc_id % 900 + 100) || '-' || (doc_id % 700 + 200)
      |       || '-' || (doc_id % 9000 + 1000) ELSE '' END""".stripMargin

  /** Word bigrams WITH multiplicity (unlike the distinct
    * [[Exprs.shingles]]) — an LM scores every occurrence. The HOF runs
    * over a pre-materialized token column so the lambda captures only an
    * attribute, not the tokenizer expression tree (the re-evaluation
    * trap documented in TextKernels).
    */
  private def bigramsAll(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2), i => concat_ws(" ", slice(w, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII scrubbing: count and strip emails/phones per source. The
    // production form is regexp_replace(raw, re, '<EMAIL>') per doc;
    // the driver-checked aggregate reports match counts and total
    // redacted characters (length delta of strip-to-empty), which pins
    // both the match SET and the match SPANS. Stateless per-row regex →
    // embarrassingly parallel at any scale; one tiny per-source shuffle.
    "text_pii_scrub" -> ((s, dir) => {
      val d = Tables.forKernels(s, dir, "documents")
        .select(col("source"), rawWithPii.as("raw"))
        .withColumn("stripped",
          regexp_replace(regexp_replace(col("raw"), lit(EMAIL_RE), lit("")),
            lit(PHONE_RE), lit("")))
      d.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(regexp_count(col("raw"), lit(EMAIL_RE))).cast("long").as("n_emails"),
          sum(regexp_count(col("raw"), lit(PHONE_RE))).cast("long").as("n_phones"),
          sum(length(col("raw")) - length(col("stripped"))).cast("long").as("n_pii_chars"))
        .orderBy(col("source"))
    }),

    // Corpus-common boilerplate fraction per doc, profiled per source —
    // the C4-style "line appears in many pages" filter recast on
    // trigrams (the synthetic docs have no line structure). Two linear
    // shuffles: gram df (word-count shape) and the per-doc/per-source
    // rollup; the gram table materializes once and feeds both the df
    // count and the join back.
    "text_boilerplate" -> ((s, dir) => {
      val grams = Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode_outer(Exprs.shingles(col("text"), BOILER_N)).as("g"))
        .localCheckpoint(true)
      val common = grams.filter(col("g").isNotNull)
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= BOILER_DF)
        .select(col("g"), lit(1L).as("is_common"))
      grams.join(common, Seq("g"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(col("g")).as("n_grams"),
          sum(coalesce(col("is_common"), lit(0L))).as("n_common"))
        .withColumn("ppm", when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("n_common * 1000000 DIV n_grams")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("n_grams"),
          sum(col("n_common")).as("n_boiler_grams"),
          expr("sum(ppm) DIV count(1)").as("avg_boiler_ppm"),
          sum(when(col("ppm") >= FLAG_PPM, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy(col("source"))
    }),

    // Bigram-LM fluency scoring — the KenLM-style quality filter shape:
    // train bigram counts on the train split, score eval docs by mean
    // train-frequency of their bigrams. Integer counts end-to-end (a
    // log-prob LM would hinge on each engine's libm; mean-count ranks
    // documents the same way for this purpose). The gram table
    // materializes once and feeds both sides; the join shuffles on the
    // gram. At 100 TB the train-count table is the big side — it stays
    // a shuffle join — and scores would normalize by corpus size.
    "text_lm_score" -> ((s, dir) => {
      val g = Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), trainEvalSplit(col("text")).as("split"),
          tokens(col("text")).as("w"))
        .select(col("doc_id"), col("split"), explode(bigramsAll(col("w"))).as("g"))
        .localCheckpoint(true)
      val trainCnt = g.filter(col("split") === "train")
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      g.filter(col("split") === "eval")
        .join(trainCnt, Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("cnt"), lit(0L))).as("lm_hits"))
        .withColumn("score_ppm", expr("lm_hits * 1000000 DIV n_bigrams"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(LM_TOPK)
    }),

    // See [[corpusReport]].
    "corpus_report" -> ((s, dir) => corpusReport(s, dir)),

    // Character-diversity stats — the entropy-family gibberish filter
    // computed EXACTLY: distinct chars, the dominant char's count, and
    // the collision mass Σc² (Rényi-2 entropy surrogate: −log₂(Σc²/n²)
    // is monotone in collision_ppm, and unlike Shannon entropy needs
    // no libm log whose last ulp differs across engines). One codegen'd
    // kernel pass in the projection — an `aggregate` HOF fold would
    // run interpreted per CHARACTER outside the codegen span, and a
    // per-char explode+groupBy would shuffle every corpus byte at
    // 100 TB (0.85s warm at sf0.1 as shipped).
    "text_char_stats" -> ((s, dir) => {
      val norm = normText(col("text"))
      Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), length(norm).cast("long").as("n_chars"),
          Exprs.charStats(norm).as("f"))
        .select(col("doc_id"), col("n_chars"),
          element_at(col("f"), 1).as("n_distinct_chars"),
          element_at(col("f"), 2).as("top_char_count"),
          element_at(col("f"), 3).as("collision_mass"),
          when(col("n_chars") === 0, 0L)
            .otherwise(floor(element_at(col("f"), 3).cast("double") * lit(1000000.0)
              / (col("n_chars").cast("double") * col("n_chars").cast("double")))
              .cast("long")).as("collision_ppm"))
        .orderBy(col("doc_id"))
    }),

    // ASYMMETRIC containment dedup: |A∩B| / |A| over distinct trigram
    // sets — "doc A is (nearly) contained in doc B". Catches the
    // quote-expansion / superset duplicates that symmetric Jaccard
    // misses (a small A inside a big B has low Jaccard but containment
    // ≈ 1). Inverted-index join restricted to grams with df ≤ DF_CAP:
    // the prefix-filtering scale dial of set-similarity joins — the
    // score is DEFINED over capped grams on both engines (identical
    // semantics at any SF; at the test SFs the cap exceeds every df,
    // so it equals exact containment), and posting lists are bounded
    // so the join's pair mass tracks co-rare-gram mass, not n².
    // How much the cap drops at a given SF is itself a driver-checked
    // output: see dedup_containment_audit below.
    "dedup_containment" -> ((s, dir) => {
      val grams = Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), explode(Exprs.shingles(col("text"), BOILER_N)).as("g"))
        .localCheckpoint(true)
      val posting = grams.join(
        grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= DF_CAP),
        Seq("g"))
        .localCheckpoint(true)
      val sizes = posting.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      // Direct inverted-index join, intersections counted in ONE
      // join + aggregate. PPJoin-style prefix filtering (candidates
      // from each doc's floor(0.2·n)+1 rarest grams, exact verify —
      // zero false negatives by pigeonhole) was implemented and
      // MEASURED 4× WORSE on the duplicate-heavy 10× corpus (78s →
      // 320s): with every doc carrying 9 near-identical twins,
      // candidates ≈ qualifying pairs, so the filter's distinct pass
      // and two verify joins prune nothing and repay nothing. On a
      // natural sparse-dup corpus the prefix filter is the right
      // dial; here df-capped posting lists bound the join and its
      // cost tracks true-containment mass (SCALING.md).
      posting.as("a").join(posting.select(col("doc_id"), col("g")).as("b"), Seq("g"))
        .filter(col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("contained_id"), col("b.doc_id").as("container_id"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.withColumnRenamed("doc_id", "contained_id"), Seq("contained_id"))
        .filter(col("n_grams") >= 5)
        .withColumn("containment_ppm", expr("shared * 1000000 DIV n_grams"))
        .filter(col("containment_ppm") >= 800000)
        .select(col("contained_id"), col("container_id"), col("shared"),
          col("n_grams"), col("containment_ppm"))
        .orderBy(col("containment_ppm").desc, col("contained_id"), col("container_id"))
        .limit(25)
    }),

    // The DF_CAP audit for dedup_containment — the no-silent-caps rule
    // made a first-class output: how much gram mass does the posting-
    // list cap actually drop at this SF? n_capped_grams/_instances are
    // 0 while the cap doesn't bind (pinned by the oracle from the data,
    // not as constants); at a SF where they go positive, the report
    // quantifies exactly what the containment score was defined over.
    // One word-count-shaped shuffle, then a scalar rollup.
    "dedup_containment_audit" -> ((s, dir) => {
      Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), explode(Exprs.shingles(col("text"), BOILER_N)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
        .agg(
          sum(col("df")).as("n_gram_instances"),
          count(lit(1)).as("n_distinct_grams"),
          sum(when(col("df") > DF_CAP, 1L).otherwise(0L)).as("n_capped_grams"),
          sum(when(col("df") > DF_CAP, col("df")).otherwise(0L)).as("n_capped_instances"),
          max(col("df")).as("max_df"))
    }),

    // Per-domain document caps — the "no single domain dominates the
    // corpus" rule (URL-host caps in a web corpus; `source` here).
    // Priority is the content md5 (deterministic across runs, engines,
    // and partitionings; duplicates cap together), kept = first CAP_K.
    // One shuffle on source; a skewed mega-domain would take the
    // salted two-phase form of skew_salted_counts — the window only
    // needs per-key local top-K merged, not a total sort.
    "corpus_domain_caps" -> ((s, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("fp"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          contentFingerprint(col("text")).as("fp"))
        .withColumn("kept", (row_number().over(w) <= CAP_K).cast("long"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("kept")).as("n_kept"),
          (count(lit(1)) - sum(col("kept"))).as("n_dropped"),
          sum(when(col("kept") === 1L, col("n_chars")).otherwise(0L)).as("sum_chars_kept"))
        .orderBy(col("source"))
    }),

    // Stratified sampling with exact per-stratum allocation: every
    // language stratum contributes max(1, floor(|stratum|/10)) docs,
    // chosen by content-md5 rank — the deterministic version of
    // proportional stratified sampling (no RNG, no engine sampling
    // operator whose row choice differs per engine/partitioning).
    // One lang-keyed shuffle serves both the stratum count and the
    // rank window; at 100 TB the allocation is exact per stratum
    // regardless of partitioning because the rank is global within
    // the stratum key.
    "corpus_stratified_sample" -> ((s, dir) => {
      val cw = Window.partitionBy(col("lang"))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"), md5(col("text")).as("h"))
        .withColumn("cnt", count(lit(1)).over(cw))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <=
          greatest(lit(1L), floor(col("cnt").cast("double") / lit(10.0)).cast("long")))
        .groupBy(col("lang"))
        .agg(max(col("cnt")).as("n_docs"),
          count(lit(1)).as("n_sampled"),
          sum(col("doc_id")).as("sampled_id_sum"),
          sum(col("n_chars")).as("sampled_chars"))
        .orderBy(col("lang"))
    }),

    // Sub-document dedup: fingerprint disjoint 16-token chunks and
    // measure, per doc, the fraction of chunk instances whose
    // fingerprint appears in ≥2 DISTINCT docs — the line/paragraph
    // dedup pass (RefinedWeb-style) at chunk granularity, catching
    // copy-paste containment that document-level fingerprints miss.
    // Word-count shuffle on the chunk fingerprint, join back, top-k;
    // the chunk table materializes once for both the df count and the
    // join. Production would drop the flagged chunks and re-emit the
    // cleaned text (same joins, plus a re-assembly projection).
    "dedup_paragraphs" -> ((s, dir) => {
      val chunks = Tables.forKernels(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), explode(chunkFps(col("w"))).as("ck"))
        .localCheckpoint(true)
      val shared = chunks.groupBy(col("ck"))
        .agg(countDistinct(col("doc_id")).as("n_docs_with"))
        .filter(col("n_docs_with") >= 2)
        .select(col("ck"), lit(1L).as("is_shared"))
      chunks.join(shared, Seq("ck"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce(col("is_shared"), lit(0L))).as("n_shared"))
        .withColumn("shared_ppm", expr("n_shared * 1000000 DIV n_chunks"))
        .orderBy(col("shared_ppm").desc, col("doc_id"))
        .limit(LM_TOPK)
    }),

    // Rank-based quality banding — quantile curation without engine-
    // dependent percentile interpolation: rank docs per source by the
    // composite quality score, band = tercile of the rank (exact
    // integer arithmetic, stable across engines and partitionings).
    // The production filter keeps band 0 (or 0-1); the profile here
    // pins the banding math. One source exchange shared by the two
    // windows and the rollup (hashpartitioning(source) satisfies the
    // (source, band) clustering).
    "text_quality_bands" -> ((s, dir) => {
      val norm = normText(col("text"))
      val toks = tokens(col("text"))
      val w = Window.partitionBy(col("source"))
      val byQ = w.orderBy(col("qp").desc, col("doc_id"))
      Tables.forKernels(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          floor(qualityScore(norm, toks) * lit(1000000.0)).cast("long").as("qp"))
        .withColumn("rn", row_number().over(byQ).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("band", expr("(rn - 1) * 3 DIV n"))
        .groupBy(col("source"), col("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          expr("sum(qp) DIV count(1)").as("avg_quality_ppm"))
        .orderBy(col("source"), col("band"))
    }),

    // Deterministic shard export — the "global shuffle" of a training
    // run: shard = content-hash byte mod SHARDS, so assignment is
    // stateless, uniform, stable across engines, and independent of
    // input partitioning (a write would partitionBy(shard) and sort
    // each shard by fp — the order both engines agree on). min_fp pins
    // the per-shard sort key the export would use.
    "corpus_shard_export" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          contentFingerprint(col("text")).as("fp"))
        .withColumn("shard", (conv(substring(col("fp"), 1, 2), 16, 10).cast("long") % SHARDS))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"),
          min(col("fp")).as("min_fp"))
        .orderBy(col("shard"))
    }),

    // Sequence packing — the LLM-training "concat and chunk" step:
    // docs are routed to deterministic shards (md5 of the doc id, so
    // assignment is stable across engines and input layouts),
    // concatenated in doc_id order within the shard, and the token
    // stream is cut every PACK_B tokens. Emits per-shard pack stats:
    // sequences produced, docs straddling a cut, and the id-sum of
    // docs landing exactly on a sequence boundary (pins the full
    // token-offset assignment, not just totals). Scale: the only
    // shuffle is the per-shard running sum — shards are independent,
    // so at 100 TB you raise PACK_SHARDS until a shard fits one task
    // and the pack stays embarrassingly parallel ACROSS shards while
    // the within-shard doc_id order keeps it reproducible/resumable.
    "corpus_sequence_packing" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
            .cast("long"), lit(PACK_SHARDS)).as("shard"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
      val cum = sum(col("n_tok")).over(
        Window.partitionBy(col("shard")).orderBy(col("doc_id")))
      d.withColumn("cum", cum)
        .withColumn("st", col("cum") - col("n_tok"))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          (floor((max(col("cum")) - 1) / PACK_B) + 1).as("n_seqs"),
          sum(when(col("n_tok") > 0 &&
              floor((col("cum") - 1) / PACK_B) > floor(col("st") / PACK_B), 1L)
            .otherwise(0L)).as("n_straddlers"),
          sum(when(col("n_tok") > 0 && col("st") % PACK_B === 0, col("doc_id"))
            .otherwise(0L)).as("boundary_doc_idsum"))
        .orderBy(col("shard"))
    }),

    // Deterministic EPOCH SHUFFLE — the training-data ordering step:
    // each epoch reshuffles the corpus into a fresh seeded permutation
    // (md5 of seed:epoch:doc_id), routed to shards by the same key, so
    // the order is fully reproducible from (seed, epoch) alone —
    // resumable mid-epoch, identical across engines and input
    // layouts, and different between epochs. The per-shard
    // position-weighted checksum (SUM(position × doc_id), positions
    // assigned in key order) pins the ENTIRE permutation, not just
    // membership. Scale: no global sort — shard assignment is a hash,
    // and each shard orders independently (raise SHUF_SHARDS until a
    // shard fits one task); epochs are embarrassingly parallel.
    "corpus_epoch_shuffle" -> ((s, dir) => {
      val epochs = s.range(0, SHUF_EPOCHS).select(col("id").as("epoch"))
      val keyed = Tables(s, dir, "documents").select(col("doc_id"))
        .crossJoin(epochs)
        .withColumn("k",
          conv(substring(md5(concat_ws(":", lit(SHUF_SEED), col("epoch"),
            col("doc_id"))), 1, 8), 16, 10).cast("long"))
        .withColumn("shard", pmod(col("k"), lit(SHUF_SHARDS.toLong)))
      // 32-bit keys can collide at corpus scale: doc_id tiebreak keeps
      // the permutation deterministic on BOTH engines.
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("k"), col("doc_id"))
      keyed.withColumn("pos", row_number().over(w).cast("long"))
        .groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("pos") * col("doc_id")).as("perm_checksum"))
        .orderBy(col("epoch"), col("shard"))
    }))

  /** The "dataset card" summary row a curation pipeline publishes with
    * a corpus snapshot: sizes, source/language breadth, token mass,
    * exact-duplicate rate, and mean quality — one aggregation pass
    * plus the exact-dup fingerprint groupBy, everything integer or
    * integer-DIV so the card is engine-exact.
    */
  private def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val d = Tables.forKernels(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        floor(qualityScore(normText(col("text")), toks) * lit(1000000.0))
          .cast("long").as("qp"),
        contentFingerprint(col("text")).as("fp"))
      .localCheckpoint(true)
    val dups = d.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("c") - 1).as("n_dup_docs"))
    d.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("sum_chars"),
      sum(col("n_tokens")).as("sum_tokens"),
      expr("sum(qp) DIV count(1)").as("mean_quality_ppm"))
      .crossJoin(dups)
      .withColumn("dup_ppm", expr("n_dup_docs * 1000000 DIV n_docs"))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("sum_chars"), col("sum_tokens"), col("mean_quality_ppm"),
        col("n_distinct").as("n_distinct_docs"), col("dup_ppm"))
  }

  private val normSql = graft.functions.TextFunctions.normSql
  private val toksSql = graft.functions.TextFunctions.toksSql
  private val trigramSql =
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])"
  // Disjoint CHUNK_TOKS-token chunk fingerprints (mirror of chunkFps).
  private val chunkSql =
    s"""[md5(list_aggregate(w[(i*$CHUNK_TOKS+1):(i*$CHUNK_TOKS+$CHUNK_TOKS)], 'string_agg', ' '))
        for i in range(0, len(w) // $CHUNK_TOKS)]"""
  private def inList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString("(", ", ", ")")
  // Mirror of TextFunctions.qualityScore in ppm, generated from the
  // ONE shared formula (TextFunctions.qualityPpmSqlFrom) with the
  // ratio CASEs inlined. Shared with the DedupQueries.dedup_canonical
  // oracle (expects `norm` and `w` columns in scope).
  private[queries] val qualityPpmSql =
    graft.functions.TextFunctions.qualityPpmSqlFrom(
      "len(w)",
      s"""(CASE WHEN len(w) = 0 THEN 0.0
              ELSE CAST(len(list_filter(w, t -> t IN ${inList(stopwords)})) AS DOUBLE) / len(w) END)""",
      """(CASE WHEN length(norm) = 0 THEN 0.0
              ELSE CAST(length(regexp_replace(norm, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(norm) END)""")

  val oracles: Map[String, String] = Map(
    // Mirror of the pack: same md5-byte shard, same doc_id-ordered
    // running token sum, same PACK_B cut arithmetic (integer // is
    // exact on the non-negative offsets both sides compute).
    "corpus_sequence_packing" ->
      s"""WITH d AS (SELECT doc_id,
              CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT)
                % $PACK_SHARDS AS BIGINT) AS shard,
              CAST(len($toksSql) AS BIGINT) AS n_tok
            FROM documents),
          p AS (SELECT shard, doc_id, n_tok,
              SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
          SELECT shard,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
            CAST((MAX(cum) - 1) // $PACK_B + 1 AS BIGINT) AS n_seqs,
            CAST(SUM(CASE WHEN n_tok > 0
                AND (cum - 1) // $PACK_B > (cum - n_tok) // $PACK_B
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
            CAST(SUM(CASE WHEN n_tok > 0 AND (cum - n_tok) % $PACK_B = 0
                THEN doc_id ELSE 0 END) AS BIGINT) AS boundary_doc_idsum
          FROM p GROUP BY shard ORDER BY shard""",
    // Mirror of the epoch shuffle: same md5-word permutation key,
    // same shard hash, same (key, doc_id) position order.
    "corpus_epoch_shuffle" ->
      s"""WITH e AS (SELECT CAST(range AS BIGINT) AS epoch
              FROM range(0, $SHUF_EPOCHS)),
          k AS (SELECT d.doc_id, e.epoch,
              CAST('0x' || substr(md5('$SHUF_SEED:' || e.epoch || ':' || d.doc_id),
                1, 8) AS BIGINT) AS k
            FROM documents d CROSS JOIN e),
          p AS (SELECT epoch, doc_id, k % $SHUF_SHARDS AS shard,
              ROW_NUMBER() OVER (PARTITION BY epoch, k % $SHUF_SHARDS
                ORDER BY k, doc_id) AS pos
            FROM k)
          SELECT epoch, CAST(shard AS BIGINT) AS shard,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(doc_id) AS BIGINT) AS id_sum,
            CAST(SUM(pos * doc_id) AS BIGINT) AS perm_checksum
          FROM p GROUP BY epoch, shard ORDER BY epoch, shard""",
    "text_pii_scrub" ->
      s"""WITH r AS (SELECT source, $rawSql AS raw FROM documents),
          s AS (SELECT source, raw,
                  regexp_replace(regexp_replace(raw, '$EMAIL_RE', '', 'g'),
                    '$PHONE_RE', '', 'g') AS stripped FROM r)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(len(regexp_extract_all(raw, '$EMAIL_RE'))) AS BIGINT) AS n_emails,
            CAST(SUM(len(regexp_extract_all(raw, '$PHONE_RE'))) AS BIGINT) AS n_phones,
            CAST(SUM(strlen(raw) - strlen(stripped)) AS BIGINT) AS n_pii_chars
          FROM s GROUP BY source ORDER BY source""",
    "text_boilerplate" ->
      s"""WITH w AS (SELECT doc_id, source, $toksSql AS w FROM documents),
          g AS (SELECT doc_id, source, unnest($trigramSql) AS g FROM w),
          df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY 1),
          pc AS (SELECT g.doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN df.df >= $BOILER_DF THEN 1 ELSE 0 END) AS n_common
                 FROM g JOIN df USING (g) GROUP BY 1),
          pd AS (SELECT d.doc_id, d.source,
                   COALESCE(pc.n_grams, 0) AS n_grams,
                   COALESCE(pc.n_common, 0) AS n_common
                 FROM documents d LEFT JOIN pc ON d.doc_id = pc.doc_id),
          pp AS (SELECT source, n_grams, n_common,
                   CASE WHEN n_grams = 0 THEN 0
                     ELSE n_common * 1000000 // n_grams END AS ppm FROM pd)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(n_grams) AS BIGINT) AS n_grams,
            CAST(SUM(n_common) AS BIGINT) AS n_boiler_grams,
            CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS avg_boiler_ppm,
            CAST(SUM(CASE WHEN ppm >= $FLAG_PPM THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
          FROM pp GROUP BY source ORDER BY source""",
    "text_lm_score" ->
      s"""WITH w AS (SELECT doc_id,
                  ${trainEvalSplitSql(s"md5($normSql)")} AS split,
                  $toksSql AS w FROM documents),
          g AS (SELECT doc_id, split,
                  unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g FROM w),
          tc AS (SELECT g, COUNT(*) AS cnt FROM g WHERE split = 'train' GROUP BY 1),
          ev AS (SELECT g.doc_id, COUNT(*) AS n_bigrams,
                   COALESCE(SUM(tc.cnt), 0) AS lm_hits
                 FROM g LEFT JOIN tc USING (g) WHERE g.split = 'eval' GROUP BY 1)
          SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
            CAST(lm_hits AS BIGINT) AS lm_hits,
            CAST(lm_hits * 1000000 // n_bigrams AS BIGINT) AS score_ppm
          FROM ev ORDER BY score_ppm DESC, doc_id LIMIT $LM_TOPK""",
    "dedup_paragraphs" ->
      s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          c AS (SELECT doc_id, unnest($chunkSql) AS ck FROM w),
          df AS (SELECT ck, COUNT(DISTINCT doc_id) AS nd FROM c GROUP BY 1),
          pd AS (SELECT c.doc_id, COUNT(*) AS n_chunks,
                   SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS n_shared
                 FROM c JOIN df USING (ck) GROUP BY 1)
          SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
            CAST(n_shared AS BIGINT) AS n_shared,
            CAST(n_shared * 1000000 // n_chunks AS BIGINT) AS shared_ppm
          FROM pd ORDER BY shared_ppm DESC, doc_id LIMIT $LM_TOPK""",
    "text_quality_bands" ->
      s"""WITH q AS (SELECT source, doc_id, n_chars, $qualityPpmSql AS qp
                 FROM (SELECT source, doc_id, n_chars, $normSql AS norm, $toksSql AS w
                       FROM documents)),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY source ORDER BY qp DESC, doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS n FROM q)
          SELECT source, CAST((rn - 1) * 3 // n AS BIGINT) AS band,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
            CAST(SUM(qp) // COUNT(*) AS BIGINT) AS avg_quality_ppm
          FROM r GROUP BY source, band ORDER BY source, band""",
    "corpus_report" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
                  CAST(len(w) AS BIGINT) AS n_tokens,
                  $qualityPpmSql AS qp,
                  md5(norm) AS fp
                FROM (SELECT doc_id, lang, source, n_chars,
                        $normSql AS norm, $toksSql AS w FROM documents)),
          dup AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
                    CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
                  FROM (SELECT fp, COUNT(*) AS c FROM d GROUP BY 1)),
          agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                    CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                    CAST(SUM(qp) // COUNT(*) AS BIGINT) AS mean_quality_ppm
                  FROM d)
          SELECT n_docs, n_langs, n_sources, sum_chars, sum_tokens,
            mean_quality_ppm, n_distinct AS n_distinct_docs,
            CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm
          FROM agg, dup""",
    // The oracle takes the explode+groupBy form — same counts, only
    // the plan shape differs (the fold is the Spark-side scale story).
    "text_char_stats" ->
      s"""WITH ch AS (SELECT doc_id, unnest(string_split($normSql, '')) AS ch
                 FROM documents),
          cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
          pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
                   CAST(SUM(c) AS BIGINT) AS n_chars,
                   CAST(MAX(c) AS BIGINT) AS top_char_count,
                   CAST(SUM(c * c) AS BIGINT) AS collision_mass
                 FROM cc GROUP BY doc_id)
          SELECT doc_id, n_chars, n_distinct_chars, top_char_count, collision_mass,
            CAST(CASE WHEN n_chars = 0 THEN 0
              ELSE floor(CAST(collision_mass AS DOUBLE) * 1000000.0
                / (CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE))) END AS BIGINT)
              AS collision_ppm
          FROM pd ORDER BY doc_id""",
    "dedup_containment" ->
      s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          g AS (SELECT doc_id, unnest($trigramSql) AS g FROM w),
          df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY 1),
          p AS (SELECT g.doc_id, g.g FROM g JOIN df USING (g) WHERE df.df <= $DF_CAP),
          sz AS (SELECT doc_id, COUNT(*) AS n_grams FROM p GROUP BY 1),
          i AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
                  COUNT(*) AS shared
                FROM p a JOIN p b USING (g) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
          c AS (SELECT contained_id, container_id, shared, sz.n_grams,
                  shared * 1000000 // sz.n_grams AS containment_ppm
                FROM i JOIN sz ON sz.doc_id = i.contained_id
                WHERE sz.n_grams >= 5)
          SELECT contained_id, container_id, CAST(shared AS BIGINT) AS shared,
            CAST(n_grams AS BIGINT) AS n_grams,
            CAST(containment_ppm AS BIGINT) AS containment_ppm
          FROM c WHERE containment_ppm >= 800000
          ORDER BY containment_ppm DESC, contained_id, container_id LIMIT 25""",
    "dedup_containment_audit" ->
      s"""WITH w AS (SELECT doc_id, $toksSql AS w FROM documents),
          g AS (SELECT doc_id, unnest($trigramSql) AS g FROM w),
          df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY 1)
          SELECT CAST(SUM(df) AS BIGINT) AS n_gram_instances,
            CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
            CAST(SUM(CASE WHEN df > $DF_CAP THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_grams,
            CAST(SUM(CASE WHEN df > $DF_CAP THEN df ELSE 0 END) AS BIGINT) AS n_capped_instances,
            CAST(MAX(df) AS BIGINT) AS max_df
          FROM df""",
    "corpus_stratified_sample" ->
      """WITH b AS (SELECT lang, doc_id, n_chars, md5(text) AS h,
               COUNT(*) OVER (PARTITION BY lang) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
             FROM documents),
          s AS (SELECT * FROM b
                WHERE rn <= GREATEST(1, CAST(floor(CAST(cnt AS DOUBLE) / 10.0) AS BIGINT)))
          SELECT lang, CAST(MAX(cnt) AS BIGINT) AS n_docs, COUNT(*) AS n_sampled,
            CAST(SUM(doc_id) AS BIGINT) AS sampled_id_sum,
            CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
          FROM s GROUP BY lang ORDER BY lang""",
    "corpus_domain_caps" ->
      s"""WITH f AS (SELECT source, doc_id, n_chars, md5($normSql) AS fp FROM documents),
          r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY fp, doc_id) AS rn
                FROM f)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN rn <= $CAP_K THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            CAST(COUNT(*) - SUM(CASE WHEN rn <= $CAP_K THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
            CAST(SUM(CASE WHEN rn <= $CAP_K THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars_kept
          FROM r GROUP BY source ORDER BY source""",
    "corpus_shard_export" ->
      s"""WITH f AS (SELECT source, n_chars, md5($normSql) AS fp FROM documents)
          SELECT CAST(CAST('0x' || substr(fp, 1, 2) AS INT) % $SHARDS AS BIGINT) AS shard,
            COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
            CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
            MIN(fp) AS min_fp
          FROM f GROUP BY 1 ORDER BY shard""")
}
