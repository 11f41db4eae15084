package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryGroup
import graft.multimodal.MediaOps
import graft.functions.VectorFunctions._

/** Multimodal plumbing exercised as driver-checkable queries. The blob
  * content is a deterministic stand-in (see MediaOps), so the
  * byte-count/metadata/frame arithmetic is fully oracle-able — and since
  * round 4 the stub features are md5-derived, so the feature-kNN query
  * is hash-exact too: the oracle recomputes feature i as the first 16
  * bits of md5(text || ':' || i) and replays the quantized-integer
  * cosine top-k in SQL.
  */
object Multimodal extends QueryGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata profile over binary columns: group on kind, never
    // touching the blob in the shuffle (only byte lengths travel).
    "media_meta_profile" -> ((s, dir) => {
      MediaOps.fakeMediaTable(s, dir)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("meta.n_bytes")).as("sum_bytes"),
          max(col("meta.n_bytes")).as("max_bytes"))
        .orderBy(col("kind"))
    }),

    // Frame sampling fan-out: blob → FRAME_BYTES-chunk frames; counts
    // verify the explode arithmetic.
    "media_frame_counts" -> ((s, dir) => {
      val frames = MediaOps.sampleFrames(MediaOps.fakeMediaTable(s, dir))
      frames.groupBy(col("kind"))
        .agg(
          countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("kind"))
    }),

    // Resize contract driver-checked: every blob lands on the target
    // byte budget (truncate/pad stub; a real impl rescales pixels) and
    // the metadata rewrite reflects the new dimensions — the part of
    // the operator that survives a real codec swap.
    "media_resize_profile" -> ((s, dir) => {
      MediaOps.resize(MediaOps.fakeMediaTable(s, dir), 320, 240)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("meta.n_bytes")).as("sum_bytes"),
          countDistinct(col("meta.width")).as("n_widths"))
        .orderBy(col("kind"))
    }),

    // MULTIMODAL NEAR-DUP: pHash-style perceptual signatures (majority
    // vote over per-frame md5 bits — see MediaOps.phashBands) blocked
    // by the 16-bit pigeonhole banded join (exact for hamming ≤ 3),
    // rolled up per media item — the image-corpus curation step that
    // was the one missing dedup family. The fixture corpus has no
    // duplicate blobs (and 1-3-chunk blobs make chunk-level near-dups
    // degenerate), so the gate PLANTS the traffic the operator exists
    // for, the pipeline-gate pattern: every %20==0 item re-uploaded
    // byte-identical under a new id (perceptual dup — MUST be caught,
    // hamming 0) and every %20==10 item with its last byte corrupted
    // (content changed — MUST be rejected: on tiny blobs one chunk is
    // most of the perception). Hash-exact: the oracle rebuilds chunk
    // hashes, bit votes, bands, planted copies, and the banded join
    // in SQL from the same md5 derivation. The signature build is
    // corpus-linear (the blob never leaves the scan; signatures are 4
    // small ints); candidate generation is an equi-join on
    // (kind, band, value) exactly like text SimHash/LSH.
    "media_phash_dedup" -> ((s, dir) => {
      val media = MediaOps.fakeMediaTable(s, dir)
      val reupload = media.filter(col("media_id") % 20 === 0)
        .withColumn("media_id", col("media_id") + 10000000L)
      val corrupt = media.filter(col("media_id") % 20 === 10)
        .withColumn("media_id", col("media_id") + 20000000L)
        .withColumn("bytes",
          expr("concat(substring(bytes, 1, cast(octet_length(bytes) as int) - 1), X'7E')"))
      // Eagerly checkpoint the signature table before the self-join,
      // same rationale as dedup_simhash: the per-chunk hash pass is
      // the dominant cost and must not run on both join sides.
      val sigs = MediaOps.phashBands(
          media.unionByName(reupload).unionByName(corrupt))
        .localCheckpoint(true)
      MediaOps.phashDupPairs(sigs)
        .groupBy(col("kind"), col("media_a"))
        .agg(count(lit(1)).as("n_dups"), min(col("media_b")).as("min_dup"),
          min(col("hamming")).as("min_hamming"))
        .orderBy(col("kind"), col("media_a"))
    }),

    // INCREMENTAL media dedup — the ingest-time shape: the existing
    // corpus's perceptual signatures are a PERSISTED index
    // (IndexStore; built once, loaded thereafter), and an arriving
    // upload batch (byte-identical re-uploads + tail-corrupted
    // copies) is signature-hashed and probed against it. Candidate
    // generation is deltaBands ⋈ baseBands — cost tracks the arrival
    // batch, not the corpus — completing the incremental trilogy
    // (text LSH, vector IVF, media pHash). Per arrival: how many
    // base dups it collides with, the canonical base id, the nearest
    // hamming.
    "media_phash_incremental" -> ((s, dir) => {
      val media = MediaOps.fakeMediaTable(s, dir)
      val baseBands = graft.util.IndexStore.loadOrBuild(s, dir, "phash_sigs_4x16")(
        MediaOps.phashBands(media))
      val reupload = media.filter(col("media_id") % 20 === 0)
        .withColumn("media_id", col("media_id") + 10000000L)
      val corrupt = media.filter(col("media_id") % 20 === 10)
        .withColumn("media_id", col("media_id") + 20000000L)
        .withColumn("bytes",
          expr("concat(substring(bytes, 1, cast(octet_length(bytes) as int) - 1), X'7E')"))
      val deltaBands = MediaOps.phashBands(reupload.unionByName(corrupt))
        .localCheckpoint(true)
      MediaOps.phashProbePairs(deltaBands, baseBands)
        .groupBy(col("kind"), col("arrival_id"))
        .agg(count(lit(1)).as("n_dups"), min(col("base_id")).as("min_dup"),
          min(col("hamming")).as("min_hamming"))
        .orderBy(col("kind"), col("arrival_id"))
    }),

    // Feature-space kNN: extract (stub) features, then top-3 neighbors
    // per image among images — binary → vector → ANN integration.
    // Hash-exact: the md5-derived stub features are rebuilt by the
    // oracle, and all cosine math is quantized-integer.
    "media_feature_knn" -> ((s, dir) => {
      // Repartition to cores before the per-byte feature kernel: the
      // scan is one row group, the decode pass is the cost (a real
      // model/codec even more so) — the mapInPandas-style "spread the
      // decode, then keep rows narrow" shape. The eager localCheckpoint
      // materializes the decoded features ONCE before the self-join:
      // without it both join inputs re-run the decode subtree (2× the
      // dominant cost; at scale you would persist this narrow table to
      // parquet — see MediaOps scale notes).
      val feats = MediaOps.extractFeatures(
          MediaOps.fakeMediaTable(s, dir).filter(col("kind") === "image")
            .repartition(s.sparkContext.defaultParallelism))
        .toDF()
        .select(col("media_id"), quantize(col("features")).as("qv"))
        .withColumn("sq", qnormSq(col("qv")))
        .localCheckpoint(true)
      val q = feats.filter(col("media_id") % 30 === 0)
        .select(col("media_id").as("query_id"), col("qv").as("q_qv"), col("sq").as("q_sq"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_ppm").desc, col("neighbor_id"))
      feats.select(col("media_id").as("neighbor_id"), col("qv"), col("sq"))
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_ppm", cosPpm(qdot(col("q_qv"), col("qv")), col("q_sq"), col("sq")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_ppm"))
        .orderBy(col("query_id"), col("rank"))
    }))

  val oracles: Map[String, String] = Map(
    "media_meta_profile" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_items,
         CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
         CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
         FROM documents GROUP BY 1 ORDER BY kind""",
    "media_frame_counts" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_media,
         CAST(SUM((strlen(text) + 255) // 256) AS BIGINT) AS n_frames
         FROM documents GROUP BY 1 ORDER BY kind""",
    // Byte budget is the same integer expression the resize stub uses.
    "media_resize_profile" ->
      s"""SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_items,
         CAST(COUNT(*) * ${320 * 240 / 256 + 1} AS BIGINT) AS sum_bytes,
         CAST(1 AS BIGINT) AS n_widths
         FROM documents GROUP BY 1 ORDER BY kind""",
    // Rebuild the pHash pipeline in SQL: chunk the text (ASCII, so
    // char substr == the byte chunks Spark frames), hash each chunk,
    // take band k's 16 bits from hex chars [4k+1,4k+4], majority-vote
    // per bit (tie -> 0), assemble bands, and replay the banded join +
    // hamming rollup — every stage from the same md5 derivation.
    "media_phash_dedup" ->
      """WITH m0 AS (SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
              text FROM documents),
          m AS (SELECT * FROM m0
                UNION ALL -- byte-identical re-upload of every %20==0 item
                SELECT media_id + 10000000, kind, text FROM m0 WHERE media_id % 20 = 0
                UNION ALL -- last byte corrupted on every %20==10 item
                SELECT media_id + 20000000, kind,
                  substr(text, 1, strlen(text) - 1) || '~' FROM m0 WHERE media_id % 20 = 10),
          ch AS (SELECT media_id, kind, md5(substr(text, 256*k+1, 256)) AS h
                 FROM (SELECT media_id, kind, text,
                         unnest(range((strlen(text) + 255) // 256)) AS k
                       FROM m) ck),
          hk AS (SELECT media_id, kind, kb.k AS band,
                   CAST(CAST('0x' || substr(h, 4*kb.k+1, 4) AS UBIGINT) AS BIGINT) AS hv
                 FROM ch, range(0, 4) kb(k)),
          votes AS (SELECT media_id, kind, band, bb.b AS b,
                   SUM(CASE WHEN (hv >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                 FROM hk, range(0, 16) bb(b) GROUP BY 1, 2, 3, 4),
          bands AS (SELECT media_id, kind, band,
                   CAST(SUM(CASE WHEN v > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bv
                 FROM votes GROUP BY 1, 2, 3),
          sig AS (SELECT media_id, kind, list(bv ORDER BY band) AS bs
                 FROM bands GROUP BY 1, 2),
          cand AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
                   x.kind AS kind
                 FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv
                   AND x.kind = y.kind AND x.media_id <> y.media_id),
          scored AS (SELECT c.kind, c.media_a, c.media_b,
                   CAST(bit_count(xor(sa.bs[1], sb.bs[1])) + bit_count(xor(sa.bs[2], sb.bs[2]))
                      + bit_count(xor(sa.bs[3], sb.bs[3])) + bit_count(xor(sa.bs[4], sb.bs[4]))
                     AS BIGINT) AS hamming
                 FROM cand c JOIN sig sa ON sa.media_id = c.media_a
                             JOIN sig sb ON sb.media_id = c.media_b)
          SELECT kind, media_a, CAST(COUNT(*) AS BIGINT) AS n_dups,
                 CAST(MIN(media_b) AS BIGINT) AS min_dup,
                 CAST(MIN(hamming) AS BIGINT) AS min_hamming
          FROM scored WHERE hamming <= 3
          GROUP BY 1, 2 ORDER BY kind, media_a""",
    // Same signature CTEs as media_phash_dedup; the probe is the
    // directional restriction (delta ids ≥ 1e7 on the left, base ids
    // below on the right) — signatures are per-media, so building
    // them jointly or separately is identical.
    "media_phash_incremental" ->
      """WITH m0 AS (SELECT doc_id AS media_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
              text FROM documents),
          m AS (SELECT * FROM m0
                UNION ALL
                SELECT media_id + 10000000, kind, text FROM m0 WHERE media_id % 20 = 0
                UNION ALL
                SELECT media_id + 20000000, kind,
                  substr(text, 1, strlen(text) - 1) || '~' FROM m0 WHERE media_id % 20 = 10),
          ch AS (SELECT media_id, kind, md5(substr(text, 256*k+1, 256)) AS h
                 FROM (SELECT media_id, kind, text,
                         unnest(range((strlen(text) + 255) // 256)) AS k
                       FROM m) ck),
          hk AS (SELECT media_id, kind, kb.k AS band,
                   CAST(CAST('0x' || substr(h, 4*kb.k+1, 4) AS UBIGINT) AS BIGINT) AS hv
                 FROM ch, range(0, 4) kb(k)),
          votes AS (SELECT media_id, kind, band, bb.b AS b,
                   SUM(CASE WHEN (hv >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                 FROM hk, range(0, 16) bb(b) GROUP BY 1, 2, 3, 4),
          bands AS (SELECT media_id, kind, band,
                   CAST(SUM(CASE WHEN v > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bv
                 FROM votes GROUP BY 1, 2, 3),
          sig AS (SELECT media_id, kind, list(bv ORDER BY band) AS bs
                 FROM bands GROUP BY 1, 2),
          cand AS (SELECT DISTINCT x.media_id AS arrival_id, y.media_id AS base_id,
                   x.kind AS kind
                 FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv
                   AND x.kind = y.kind AND x.media_id <> y.media_id
                 WHERE x.media_id >= 10000000 AND y.media_id < 10000000),
          scored AS (SELECT c.kind, c.arrival_id, c.base_id,
                   CAST(bit_count(xor(sa.bs[1], sb.bs[1])) + bit_count(xor(sa.bs[2], sb.bs[2]))
                      + bit_count(xor(sa.bs[3], sb.bs[3])) + bit_count(xor(sa.bs[4], sb.bs[4]))
                     AS BIGINT) AS hamming
                 FROM cand c JOIN sig sa ON sa.media_id = c.arrival_id
                             JOIN sig sb ON sb.media_id = c.base_id)
          SELECT kind, arrival_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
                 CAST(MIN(base_id) AS BIGINT) AS min_dup,
                 CAST(MIN(hamming) AS BIGINT) AS min_hamming
          FROM scored WHERE hamming <= 3
          GROUP BY 1, 2 ORDER BY kind, arrival_id""",
    // Rebuild the md5-derived stub features (MediaOps.fakeDecodeFeatures)
    // per dimension, quantize to milli-units, and replay the broadcast
    // top-3 cosine join — integer math until the single final cosPpm
    // division, so the hash matches Spark bit-for-bit.
    "media_feature_knn" ->
      s"""WITH f AS (
            SELECT doc_id AS media_id, i,
              CAST(CAST(('0x' || substr(md5(text || ':' || CAST(i AS VARCHAR)), 1, 4)) AS UBIGINT) AS BIGINT) AS fv
            FROM documents, range(0, ${MediaOps.FEATURE_DIM}) t(i)
            WHERE doc_id % 3 = 0),
          n AS (SELECT media_id, list(fv * 1000 ORDER BY i) AS qv FROM f GROUP BY 1),
          nn AS (SELECT media_id, qv, CAST(list_sum([x*x for x in qv]) AS BIGINT) AS sq FROM n),
          qp AS (SELECT media_id AS query_id, qv AS q_qv, sq AS q_sq FROM nn WHERE media_id % 30 = 0),
          sc AS (SELECT qp.query_id, nb.media_id AS neighbor_id,
                   CAST(floor(CAST(CAST(list_sum([qp.q_qv[i]*nb.qv[i] for i in range(1, len(qp.q_qv)+1)]) AS BIGINT) AS DOUBLE)
                     * 1000000.0 / (sqrt(CAST(qp.q_sq AS DOUBLE))*sqrt(CAST(nb.sq AS DOUBLE)))) AS BIGINT) AS cos_ppm
                 FROM qp JOIN nn nb ON nb.media_id <> qp.query_id),
          r AS (SELECT query_id, neighbor_id, cos_ppm,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_ppm DESC, neighbor_id) AS BIGINT) AS rank
                FROM sc)
          SELECT query_id, rank, neighbor_id, cos_ppm FROM r
          WHERE rank <= 3 ORDER BY query_id, rank""")
}
