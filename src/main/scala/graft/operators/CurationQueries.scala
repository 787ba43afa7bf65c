package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-backed curation queries (SURVEY.md §2.C14-C15).
  *
  * The sampling oracles reimplement graft's FNV-1a keyed hash in
  * DuckDB (same list_reduce + HUGEINT recipe as qtext_fingerprint's
  * oracle, then the signed-BIGINT cast) so bucket membership and hash
  * ORDER are bit-identical across engines — pmod on Spark's signed
  * long equals `((sb % m) + m) % m` on the signed DuckDB value.
  *
  * The cluster oracle resolves connected components with a recursive
  * CTE (min reachable id) over the SAME pair CTEs as qdedup_simhash's
  * proven oracle, so a cluster mismatch isolates the component
  * resolution, not the pair generation.
  */
object CurationQueries {

  /** FNV-1a(salt:doc_id) as a signed BIGINT `sb`, carried with
    * (doc_id, `carry`) from CTE/table `src` through a chain ending in
    * `g` — built on the single shared recipe (Q.sqlutil). */
  private def fnvKeyCtes(salt: String, carry: String = "lang",
                         src: String = "documents"): String =
    graft.Q.sqlutil.fnvSignedCtes("",
      s"'$salt:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", carry), src)

  /** THE recursive-CTE connected-components block (over the simhash
    * `pairs` CTE): min reachable id per node → `cc(doc_id,
    * cluster_id)`. ONE definition interpolated by every
    * cluster-consuming oracle (clusters/clusters_star/apply/
    * apply_best/split_clustered) so a future fix to the resolution
    * can't silently diverge one of them. */
  private val ComponentCcCtes: String = """
      e AS (SELECT doc_a AS s, doc_b AS t FROM pairs
            UNION ALL
            SELECT doc_b AS s, doc_a AS t FROM pairs),
      reach AS (SELECT s AS id, s AS lbl FROM e
                UNION
                SELECT e.s AS id, r.lbl AS lbl
                FROM e JOIN reach r ON r.id = e.t),
      cc AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)"""

  /** C140: shard manifests over the C17 packing — per shard, doc
    * count, token total, and the order-independent mod-2⁶⁴ content
    * checksum a loader re-derives to verify a hand-off. The oracle
    * replays the shuffle-hash shard assignment (the green qpack_shards
    * chain) plus a second FNV pass for the manifest fingerprints and
    * the HUGEINT checksum arithmetic. */
  val qPackManifest = Q(
    "qpack_manifest",
    (s, dir) => {
      Curation.shardManifest(
        Curation.packShards(
          Tables(s, dir).documents, col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 1000L))
        .orderBy(col("shard"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens"), "sized")},
      o AS (SELECT doc_id, n_tokens,
              CAST(SUM(n_tokens) OVER (ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM f),
      sh AS (SELECT doc_id, n_tokens, (cum - n_tokens) // 1000 AS shard FROM o),
      ${graft.Q.sqlutil.fnvSignedCtes("mf",
        "'manifest:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens", "shard"), "sh")},
      u AS (SELECT shard, n_tokens,
              CASE WHEN sb < 0
                   THEN CAST(sb AS HUGEINT) + 18446744073709551616::HUGEINT
                   ELSE CAST(sb AS HUGEINT) END AS hu
            FROM mfg),
      agg AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                SUM(hu) % 18446744073709551616::HUGEINT AS s
              FROM u GROUP BY shard)
      SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_tokens,
             CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                  THEN s - 18446744073709551616::HUGEINT
                  ELSE s END AS BIGINT) AS checksum
      FROM agg
      ORDER BY shard"""))

  /** C139: temperature-scaled mixture allocation at α = 0.5 — the
    * XLM-R low-resource up-sampling rule over per-source token masses,
    * apportioned by the shared exact largest-remainder integer path.
    * The oracle mirrors √size rounded once to fixed point and the
    * HUGEINT apportionment, so the ±1 boundaries are hash-gated. */
  val qMixTemperature = Q(
    "qmix_temperature",
    (s, dir) => {
      Curation.temperatureAllocation(
          Tables(s, dir).documents, col("source"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 10000L)
        .orderBy(col("source"))
    },
    Some("""
      WITH sized AS (SELECT source,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS sz
             FROM documents),
      m AS (SELECT source, CAST(SUM(sz) AS BIGINT) AS size
            FROM sized GROUP BY source),
      w AS (SELECT source, size,
              CAST(ROUND(sqrt(CAST(size AS DOUBLE)) * 1e6) AS HUGEINT) AS wt
            FROM m),
      t AS (SELECT SUM(wt) AS t FROM w),
      a AS (SELECT source, size,
              CASE WHEN t.t > 0 THEN CAST((10000 * wt) // t.t AS BIGINT) ELSE 0 END AS q,
              CASE WHEN t.t > 0 THEN (10000 * wt) % t.t ELSE 0::HUGEINT END AS rem
            FROM w, t),
      lo AS (SELECT 10000 - CAST(COALESCE(SUM(q), 0) AS BIGINT) AS leftover FROM a),
      r AS (SELECT a.*, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
              AS BIGINT) AS rr
            FROM a)
      SELECT source, size,
             q + CASE WHEN rr <= lo.leftover AND rem > 0 THEN 1 ELSE 0 END AS alloc
      FROM r, lo
      ORDER BY source"""))

  /** C147: recency-weighted replay-budget allocation over the events
    * stream — per-event 2^-(age/halflife) decay as an exact left
    * shift (3-day half-life, 16-half-life floor), apportioned by the
    * shared exact largest-remainder path. All-integer end to end;
    * the oracle mirrors the epoch-µs ages, the shift, and the
    * HUGEINT apportionment. */
  val qSampleRecency = Q(
    "qsample_recency",
    (s, dir) => {
      Curation.recencyAllocation(Tables(s, dir).events,
          col("event_type"), expr("ts div 1000"),
          budget = 1000L, halflifeUs = 259200000000L)
        .orderBy(col("source"))
    },
    Some("""
      WITH ev AS (SELECT event_type AS source, epoch_us(ts) AS us FROM events),
      mx AS (SELECT MAX(us) AS max_us FROM ev),
      aged AS (SELECT source,
               CASE WHEN (mx.max_us - us) // 259200000000 < 16
                    THEN (1::BIGINT << CAST(16 - (mx.max_us - us) // 259200000000 AS INT))
                    ELSE 0 END AS w_e
               FROM ev, mx),
      w AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(w_e) AS HUGEINT) AS wt FROM aged GROUP BY source),
      t AS (SELECT SUM(wt) AS t FROM w),
      a AS (SELECT source, n_events,
              CASE WHEN t.t > 0 THEN CAST((1000 * wt) // t.t AS BIGINT) ELSE 0 END AS q,
              CASE WHEN t.t > 0 THEN (1000 * wt) % t.t ELSE 0::HUGEINT END AS rem
            FROM w, t),
      lo AS (SELECT 1000 - CAST(COALESCE(SUM(q), 0) AS BIGINT) AS leftover FROM a),
      r AS (SELECT a.*, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
              AS BIGINT) AS rr
            FROM a)
      SELECT source, n_events,
             q + CASE WHEN rr <= lo.leftover AND rem > 0 THEN 1 ELSE 0 END AS alloc
      FROM r, lo
      ORDER BY source"""))

  /** C144: curriculum staging by length-decile difficulty — the
    * easy→hard pacing table: 10 levels (50-token bands, capped),
    * 4 equal-token stages cut by the exact DECIMAL offset rule. The
    * oracle replays the unsigned-FNV within-level order, the global
    * running sums, and the integer stage cut, so every stage boundary
    * is hash-gated. */
  val qPackCurriculum = Q(
    "qpack_curriculum",
    (s, dir) => {
      val toks = graft.functions.TextFunctions.tokenCountWs(col("text"))
      // floor(double division) is the chosen exact-in-range band cut:
      // exact for token counts below 2^53 (a single document's
      // whitespace token count is nowhere near that), matching the
      // oracle's integral `// 50`
      val level = least(floor(toks.cast("long") / lit(50L)).cast("long"), lit(9L))
      Curation.curriculumStages(Tables(s, dir).documents, col("doc_id"),
          toks, level, nStages = 4)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents),
      lv AS (SELECT doc_id, n_tokens,
               least(n_tokens // 50, 9) AS level FROM sized),
      ${graft.Q.sqlutil.fnvSignedCtes("cu",
        "'curriculum:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "n_tokens", "level"), "lv")},
      o AS (SELECT doc_id, n_tokens, level,
              CAST(ROW_NUMBER() OVER (ORDER BY level, fh, doc_id) AS BIGINT) AS pos,
              CAST(SUM(n_tokens) OVER (ORDER BY level, fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM cuf),
      t AS (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total FROM sized)
      SELECT doc_id, level, n_tokens, pos, cum,
             CASE WHEN t.total > 0
                  THEN least(((cum - n_tokens) * 4) // t.total, 3)
                  ELSE 0 END AS stage
      FROM o, t ORDER BY doc_id"""))

  /** C139 at dyadic α = ¾ (num 3, 2² den): the weight is the product
    * of the √- and √√-chains — two correctly-rounded IEEE sqrts and
    * one multiply, mirrored literally by the oracle, so arbitrary-
    * dyadic-α parity is hash-gated, not just the α = ½ special case. */
  val qMixTemperature75 = Q(
    "qmix_temperature75",
    (s, dir) => {
      Curation.temperatureAllocation(
          Tables(s, dir).documents, col("source"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 10000L, alphaNum = 3, alphaLog2Den = 2)
        .orderBy(col("source"))
    },
    Some("""
      WITH sized AS (SELECT source,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS sz
             FROM documents),
      m AS (SELECT source, CAST(SUM(sz) AS BIGINT) AS size
            FROM sized GROUP BY source),
      w AS (SELECT source, size,
              CAST(ROUND(sqrt(CAST(size AS DOUBLE))
                         * sqrt(sqrt(CAST(size AS DOUBLE))) * 1e6) AS HUGEINT) AS wt
            FROM m),
      t AS (SELECT SUM(wt) AS t FROM w),
      a AS (SELECT source, size,
              CASE WHEN t.t > 0 THEN CAST((10000 * wt) // t.t AS BIGINT) ELSE 0 END AS q,
              CASE WHEN t.t > 0 THEN (10000 * wt) % t.t ELSE 0::HUGEINT END AS rem
            FROM w, t),
      lo AS (SELECT 10000 - CAST(COALESCE(SUM(q), 0) AS BIGINT) AS leftover FROM a),
      r AS (SELECT a.*, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
              AS BIGINT) AS rr
            FROM a)
      SELECT source, size,
             q + CASE WHEN rr <= lo.leftover AND rem > 0 THEN 1 ELSE 0 END AS alloc
      FROM r, lo
      ORDER BY source"""))

  /** C138: Neyman-optimal labeling-budget allocation across sources —
    * n_h ∝ N_h·S_h with all-integer largest-remainder apportionment
    * (div/% on DECIMAL, never a rounding decimal divide) and the
    * N_h cap. The oracle replays moments, the one-rounded sqrt, and
    * the HUGEINT apportionment term-for-term, so the ±1 remainder
    * boundary is hash-gated. */
  val qNeyman = Q(
    "qsample_neyman",
    (s, dir) => {
      Curation.neymanAllocation(
          Tables(s, dir).documents, col("source"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 100L)
        .orderBy(col("source"))
    },
    Some("""
      WITH sized AS (SELECT source,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS x
             FROM documents),
      m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2
            FROM sized GROUP BY source),
      st AS (SELECT source, n_docs,
               CAST(ROUND(sqrt(greatest(
                 CAST(s2 AS DOUBLE) / n_docs
                   - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs),
                 0.0)) * 1e6) AS BIGINT) AS std_micro
             FROM m),
      w AS (SELECT source, n_docs, std_micro,
              CAST(n_docs AS HUGEINT) * std_micro AS wt
            FROM st),
      t AS (SELECT SUM(wt) AS t FROM w),
      a AS (SELECT source, n_docs, std_micro,
              CASE WHEN t.t > 0 THEN CAST((100 * wt) // t.t AS BIGINT) ELSE 0 END AS q,
              CASE WHEN t.t > 0 THEN (100 * wt) % t.t ELSE 0::HUGEINT END AS rem
            FROM w, t),
      lo AS (SELECT 100 - CAST(COALESCE(SUM(q), 0) AS BIGINT) AS leftover FROM a),
      r AS (SELECT a.*, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
              AS BIGINT) AS rr
            FROM a)
      SELECT source, n_docs, std_micro,
             least(n_docs, q + CASE WHEN rr <= lo.leftover AND rem > 0
                               THEN 1 ELSE 0 END)
               AS alloc
      FROM r, lo
      ORDER BY source"""))

  /** C137: the dedup sign-off report over the same simhash dup graph
    * the cluster queries resolve — per cluster-size: clusters, docs,
    * docs/bytes the keep-min apply would drop. The oracle recomputes
    * the whole chain (pairs → recursive CC → singleton coalesce →
    * keep-min byte attribution) so the report's totals are gated, not
    * just its shape. */
  val qDedupReport = Q(
    "qdedup_report",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"),
        maxDist = 3)
      val members = Curation.connectedComponents(pairs, col("doc_a"), col("doc_b"))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      Curation.dedupReport(t.documents, col("doc_id"), col("n_chars"), members)
        .transform(Q.orderedDump(_, col("cluster_size")))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      alld AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS bytes,
                 COALESCE(cc.cluster_id, d.doc_id) AS cid
               FROM documents d LEFT JOIN cc USING (doc_id)),
      per AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS sz,
                CAST(SUM(bytes) AS BIGINT) AS b_total,
                MIN(doc_id) AS keep_id
              FROM alld GROUP BY cid),
      kb AS (SELECT per.sz, per.b_total, a.bytes AS b_keep
             FROM per JOIN alld a ON a.doc_id = per.keep_id)
      SELECT sz AS cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(sz) AS BIGINT) AS n_docs,
             CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_dropped,
             CAST(SUM(b_total) AS BIGINT) AS bytes_total,
             CAST(SUM(b_total - b_keep) AS BIGINT) AS bytes_dropped
      FROM kb GROUP BY sz
      ORDER BY cluster_size"""))

  val qSampleHash = Q(
    "qsample_hash",
    (s, dir) => {
      Curation.sampleByHash(
          Tables(s, dir).documents.select(col("doc_id"), col("lang")),
          col("doc_id"), pct = 37)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${fnvKeyCtes("graft")}
      SELECT doc_id, lang, ((sb % 100) + 100) % 100 AS bucket
      FROM g
      WHERE ((sb % 100) + 100) % 100 < 37
      ORDER BY doc_id"""))

  // C86: Efraimidis-Spirakis weighted sampling without replacement —
  // n_chars-proportional inclusion odds, exactly k=100 rows. The
  // oracle mirrors the whole key derivation on the shared FNV recipe:
  // 53-bit fold, the exact (h+0.5)/2^53 uniform, ln rounded once to
  // micro-nats, ONE IEEE division — identical doubles, identical
  // top-k boundary in both engines.
  val qSampleWeighted = Q(
    "qsample_weighted",
    (s, dir) => {
      Curation.sampleByWeight(
          Tables(s, dir).documents.select(col("doc_id"), col("n_chars")),
          col("doc_id"), col("n_chars"), k = 100)
        .select(col("sample_rank"), col("doc_id"), col("n_chars"), col("es_key"))
        .orderBy(col("sample_rank"))
    },
    Some(s"""
      WITH ${fnvKeyCtes("wsample", carry = "n_chars")},
      keyed AS (SELECT doc_id, n_chars,
          CAST(ROUND(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS w_micro,
          CAST(ROUND(ln((CAST(((sb % 9007199254740992) + 9007199254740992) % 9007199254740992 AS DOUBLE) + 0.5)
                        / 9007199254740992.0) * 1e6) AS BIGINT) AS lnu_micro
        FROM g WHERE CAST(ROUND(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) > 0)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS sample_rank,
             doc_id, n_chars, es_key
      FROM (SELECT doc_id, n_chars,
              CAST(lnu_micro AS DOUBLE) / CAST(w_micro AS DOUBLE) AS es_key
            FROM keyed)
      ORDER BY es_key DESC, doc_id LIMIT 100"""))

  // C86b: the per-group variant — exact k=20 per language, chosen
  // weight-proportionally WITHIN each group (the balanced-mixture
  // shape); same shared key derivation, group-partitioned rank.
  val qSampleWeightedGroup = Q(
    "qsample_weighted_group",
    (s, dir) => {
      Curation.sampleByWeightPerGroup(
          Tables(s, dir).documents.select(col("doc_id"), col("lang"), col("n_chars")),
          col("lang"), col("doc_id"), col("n_chars"), k = 20)
        .select(col("lang"), col("sample_rank"), col("doc_id"), col("n_chars"),
          col("es_key"))
        .orderBy(col("lang"), col("sample_rank"))
    },
    Some(s"""
      WITH ${graft.Q.sqlutil.fnvSignedCtes("",
        "'wsample:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "lang", "n_chars"), "documents")},
      keyed AS (SELECT doc_id, lang, n_chars,
          CAST(ROUND(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS w_micro,
          CAST(ROUND(ln((CAST(((sb % 9007199254740992) + 9007199254740992) % 9007199254740992 AS DOUBLE) + 0.5)
                        / 9007199254740992.0) * 1e6) AS BIGINT) AS lnu_micro
        FROM g WHERE CAST(ROUND(CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) > 0),
      r AS (SELECT lang, doc_id, n_chars,
              CAST(lnu_micro AS DOUBLE) / CAST(w_micro AS DOUBLE) AS es_key
            FROM keyed)
      SELECT lang, sample_rank, doc_id, n_chars, es_key FROM (
        SELECT lang, doc_id, n_chars, es_key,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY es_key DESC, doc_id) AS BIGINT) AS sample_rank
        FROM r)
      WHERE sample_rank <= 20
      ORDER BY lang, sample_rank"""))

  /** Domain-mixture sampling (C23): per-language keep rates, including
    * a 0% exclusion and a fall-through default. */
  val qSampleMix = Q(
    "qsample_mix",
    (s, dir) => {
      Curation.sampleByHashPerGroup(
          Tables(s, dir).documents.select(col("doc_id"), col("lang")),
          col("doc_id"), col("lang"),
          rates = Map("en" -> 80, "de" -> 25, "zh" -> 0), defaultPct = 50)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${fnvKeyCtes("mix")}
      SELECT doc_id, lang, ((sb % 100) + 100) % 100 AS bucket
      FROM g
      WHERE ((sb % 100) + 100) % 100 <
        CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 25 WHEN 'zh' THEN 0 ELSE 50 END
      ORDER BY doc_id"""))

  /** Leakage-safe train/val/test split (C30): every doc labeled by its
    * FNV bucket range — 90/5/5. All rows out, so the oracle checks the
    * full assignment, not just one side of a cut. */
  val qSplit = Q(
    "qsplit_assign",
    (s, dir) => {
      Curation.splitByHash(
          Tables(s, dir).documents.select(col("doc_id"), col("lang")),
          col("doc_id"),
          splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${fnvKeyCtes("split")}
      SELECT doc_id, lang, ((sb % 100) + 100) % 100 AS bucket,
        CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
             WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM g
      ORDER BY doc_id"""))

  /** Leakage-safe split (C40): near-dup cluster members split
    * TOGETHER — the split key is COALESCE(cluster_id, doc_id), so a
    * train doc's near-duplicate can never land in test. Same cluster
    * resolution as qdedup_clusters, same FNV bucket recipe as
    * qsplit_assign, composed. */
  val qSplitClustered = Q(
    "qsplit_clustered",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val cl = Curation.clusters(pairs, col("doc_a"), col("doc_b"))
      Curation.splitByHashClustered(
          t.documents.select(col("doc_id")), col("doc_id"), cl,
          splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      keyed AS (SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS skey
                FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'split:' || CAST(skey AS VARCHAR)", Seq("doc_id"), "keyed")}
      SELECT doc_id, ((sb % 100) + 100) % 100 AS bucket,
        CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
             WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM g
      ORDER BY doc_id"""))

  /** C123: exact stratified split — 10% val per source, floor-exact
    * and deterministic in salted-FNV order. The oracle replays the
    * proven per-source rank recipe (the qcuration_source_cap unsigned
    * fh ordering) against a per-source count join; the verdict is the
    * same integer comparison on both sides. */
  val qSplitStratified = Q(
    "qsplit_stratified",
    (s, dir) =>
      Curation.stratifiedSplit(
          Tables(s, dir).documents, col("doc_id"), col("source"),
          valNum = 1, valDen = 10)
        .orderBy(col("source"), col("src_pos")),
    Some(s"""
      WITH base AS (SELECT doc_id, source FROM documents
                    WHERE source IS NOT NULL),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'split:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "source"), "base")},
      o AS (SELECT doc_id, source,
              CAST(row_number() OVER (PARTITION BY source ORDER BY fh, doc_id)
                AS BIGINT) AS src_pos
            FROM f),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
            FROM base GROUP BY source)
      SELECT o.doc_id, o.source, o.src_pos, n.n_src,
             CASE WHEN o.src_pos * 10 <= n.n_src * 1
                  THEN 'val' ELSE 'train' END AS split
      FROM o JOIN n USING (source)
      ORDER BY source, src_pos"""))

  /** Snapshot patch round-trip (C118): the same old/new fixture as
    * qcorpus_diff, with the patch CONSTRUCTED from corpusDiff (non-
    * unchanged rows + new-side payloads) and applied by corpusPatch.
    * The oracle is the target snapshot itself — the whole
    * diff → patch → apply machine must reproduce it byte-for-byte,
    * which pins both operators' semantics against each other. */
  val qCorpusPatch = Q(
    "qcorpus_patch",
    (s, dir) => {
      val d = Tables(s, dir).documents
      val old = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val neu = d.filter(pmod(col("doc_id"), lit(10)) =!= 1)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 2,
            concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
      val patch = Curation.corpusDiff(old, neu, col("doc_id"), col("text"))
        .filter(col("status") =!= "unchanged")
        .join(neu.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
      Curation.corpusPatch(old, col("doc_id"), col("text"),
          patch, col("doc_id"), col("status"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 10 = 2 THEN text || ' [v2]' ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 1
      ORDER BY doc_id"""))

  /** Cross-split leakage audit of the NAIVE hash split (C116): the
    * same simhash pair source and the same 90/5/5 assignment as
    * qsplit_assign, composed — off-diagonal rows are near-dup pairs
    * straddling splits, the exposure qsplit_clustered exists to
    * prevent. Oracle chains the two proven formulations + the
    * least/greatest fold. */
  val qSplitLeakage = Q(
    "qsplit_leakage",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val asg = Curation.splitByHash(t.documents.select(col("doc_id")), col("doc_id"),
        splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
      Curation.splitLeakage(pairs, col("doc_a"), col("doc_b"),
          asg, col("doc_id"), col("split"))
        .orderBy(col("split_a"), col("split_b"))
    },
    Some(s"""
      WITH ${DedupQueries.simhashPairCtes(3)},
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'split:' || CAST(doc_id AS VARCHAR)", Seq("doc_id"), "documents")},
      asg AS (SELECT doc_id,
                CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
                     WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
                     ELSE 'test' END AS s
              FROM g),
      j AS (SELECT LEAST(x.s, y.s) AS split_a, GREATEST(x.s, y.s) AS split_b
            FROM pairs p
            JOIN asg x ON p.doc_a = x.doc_id
            JOIN asg y ON p.doc_b = y.doc_id)
      SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             split_a <> split_b AS leaked
      FROM j GROUP BY split_a, split_b
      ORDER BY split_a, split_b"""))

  /** The same audit over the CLUSTER-AWARE split (C116b): by
    * construction every near-dup pair shares a cluster, every cluster
    * shares a split key — the off-diagonal MUST be empty, and this
    * query proves it mechanically (diagonal rows remain, so an empty
    * result can't pass vacuously). */
  val qSplitLeakageCl = Q(
    "qsplit_leakage_cl",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val cl = Curation.clusters(pairs, col("doc_a"), col("doc_b"))
      val asg = Curation.splitByHashClustered(
        t.documents.select(col("doc_id")), col("doc_id"), cl,
        splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
      Curation.splitLeakage(pairs, col("doc_a"), col("doc_b"),
          asg, col("doc_id"), col("split"))
        .orderBy(col("split_a"), col("split_b"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      keyed AS (SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS skey
                FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'split:' || CAST(skey AS VARCHAR)", Seq("doc_id"), "keyed")},
      asg AS (SELECT doc_id,
                CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
                     WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
                     ELSE 'test' END AS s
              FROM g),
      j AS (SELECT LEAST(x.s, y.s) AS split_a, GREATEST(x.s, y.s) AS split_b
            FROM pairs p
            JOIN asg x ON p.doc_a = x.doc_id
            JOIN asg y ON p.doc_b = y.doc_id)
      SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             split_a <> split_b AS leaked
      FROM j GROUP BY split_a, split_b
      ORDER BY split_a, split_b"""))

  /** Token-budget carve-out (C30b): the minimal FNV-ordered prefix
    * covering 5000 tokens — [[Curation.sampleByBudget]], i.e. shard 0
    * of the qpack_shards prefix sum (same oracle formulation, cut at
    * the budget). */
  val qSampleBudget = Q(
    "qsample_budget",
    (s, dir) => {
      Curation.sampleByBudget(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 5000L)
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens"), "sized")},
      o AS (SELECT doc_id, n_tokens,
              CAST(row_number() OVER (ORDER BY fh, doc_id) AS BIGINT) AS pos,
              CAST(SUM(n_tokens) OVER (ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM f)
      SELECT doc_id, pos, n_tokens, cum
      FROM o
      WHERE cum - n_tokens < 5000
      ORDER BY pos"""))

  val qSampleGroupTopK = Q(
    "qsample_group_topk",
    (s, dir) => {
      Curation.samplePerGroup(
          Tables(s, dir).documents.select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), k = 20)
        .orderBy(col("lang"), col("sample_rank"))
    },
    Some(s"""
      WITH ${fnvKeyCtes("strat")},
      r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang ORDER BY sb, doc_id) AS sample_rank
            FROM g)
      SELECT doc_id, lang, sample_rank FROM r
      WHERE sample_rank <= 20
      ORDER BY lang, sample_rank"""))

  /** Shared recursive-CTE component oracle over the simhash pair CTEs:
    * min reachable id per node — gates BOTH component algorithms
    * (min-label propagation and star contraction), so a mismatch in
    * either isolates that algorithm. */
  private val ClustersOracle = s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes
      SELECT doc_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM cc
      ORDER BY doc_id"""

  val qClusters = Q(
    "qdedup_clusters",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      Curation.clusters(pairs, col("doc_a"), col("doc_b"))
        .transform(Q.orderedDump(_, col("doc_id")))
    },
    Some(ClustersOracle))

  /** The same resolution by alternating star contraction
    * (Curation.connectedComponentsStar) under the same oracle — the
    * depth-robust variant a chain-shaped dup graph needs. */
  val qClustersStar = Q(
    "qdedup_clusters_star",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      Curation.clustersStar(pairs, col("doc_a"), col("doc_b"))
        .transform(Q.orderedDump(_, col("doc_id")))
    },
    Some(ClustersOracle))

  /** Deterministic shuffle + token-budget shard packing. The oracle
    * computes the same unsigned-hash global order with a plain window
    * (fine at oracle scale); the Spark side uses the distributed
    * two-pass prefix sum — order parity holds because per-bucket
    * signed order equals unsigned global order (hashes in a bucket
    * share their sign bit). */
  val qPackShards = Q(
    "qpack_shards",
    (s, dir) => {
      Curation.packShards(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 1000L)
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens"), "sized")},
      o AS (SELECT doc_id, n_tokens,
              CAST(row_number() OVER (ORDER BY fh, doc_id) AS BIGINT) AS pos,
              CAST(SUM(n_tokens) OVER (ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM f)
      SELECT doc_id, pos, n_tokens, cum, (cum - n_tokens) // 1000 AS shard
      FROM o
      ORDER BY pos"""))

  /** Fixed-length sequence packing: the concat-and-chunk span table a
    * training loader reads. Same global order as qpack_shards; the
    * span arithmetic (which sequences a doc straddles, at what
    * offsets) is pure integer division, mirrored term-for-term in the
    * oracle's lateral range unnest. */
  val qPackSequences = Q(
    "qpack_sequences",
    (s, dir) => {
      Curation.packSequences(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          seqLen = 512L)
        .orderBy(col("pos"), col("seq_id"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens"), "sized")},
      o AS (SELECT doc_id, n_tokens,
              CAST(row_number() OVER (ORDER BY fh, doc_id) AS BIGINT) AS pos,
              CAST(SUM(n_tokens) OVER (ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM f)
      SELECT doc_id, pos, n_tokens, CAST(u.seq_id AS BIGINT) AS seq_id,
             greatest(cum - n_tokens, u.seq_id * 512) - (cum - n_tokens) AS doc_off,
             greatest(cum - n_tokens, u.seq_id * 512) - u.seq_id * 512 AS seq_off,
             least(cum, (u.seq_id + 1) * 512)
               - greatest(cum - n_tokens, u.seq_id * 512) AS span_len
      FROM o, UNNEST(range((cum - n_tokens) // 512, ((cum - 1) // 512) + 1)) AS u(seq_id)
      WHERE n_tokens > 0
      ORDER BY pos, seq_id"""))

  /** C110: per-source token caps at 20k tokens — the domain-quota
    * audit view. The oracle runs the per-source running sum as one
    * window; the Spark side's (source, sub-bucket) two-pass prefix
    * sum must reproduce every src_pos/src_cum exactly or a kept
    * verdict flips at the budget boundary. */
  val qSourceCap = Q(
    "qcuration_source_cap",
    (s, dir) => {
      Curation.capPerSource(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          col("source"),
          budget = 20000L)
        .orderBy(col("source"), col("src_pos"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id, source,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents
                     WHERE text IS NOT NULL AND source IS NOT NULL),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "source", "n_tokens"), "sized")},
      o AS (SELECT doc_id, source, n_tokens,
              CAST(row_number() OVER (PARTITION BY source ORDER BY fh, doc_id)
                AS BIGINT) AS src_pos,
              CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS src_cum
            FROM f WHERE n_tokens > 0)
      SELECT doc_id, source, n_tokens, src_pos, src_cum,
             (src_cum - n_tokens < 20000) AS kept
      FROM o
      ORDER BY source, src_pos"""))

  /** C111: mixture-plan EXECUTION — the C59 temperature plan's
    * per-source token allocations applied by C110's deterministic
    * per-source truncation, composed end to end in one query (plan →
    * allocation frame → capped corpus audit view). The oracle chains
    * both proven formulations: the sqrt-weight/share/trunc allocation
    * arithmetic, then the per-source running-sum cut against it.
    * Budget 200k at α = ½ makes big sources truncate and small ones
    * keep everything (epochs > 1 stays the reader's repeat factor —
    * the executor never duplicates rows). */
  val qMixApply = Q(
    "qmix_apply",
    (s, dir) => {
      val d = Tables(s, dir).documents
      val plan = Curation.mixturePlan(d, col("source"), col("n_chars"),
        budget = 200000L, sqrtTimes = 1)
      Curation.capPerSourceBudgets(
          d, col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          col("source"),
          plan, col("source"), col("alloc_tokens"))
        .orderBy(col("source"), col("src_pos"))
    },
    Some(s"""
      WITH t AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source),
      w AS (SELECT *, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                        AS w_micro FROM t),
      sw AS (SELECT SUM(w_micro) AS wt FROM w),
      alloc AS (SELECT source,
              CAST(trunc((CAST(w_micro AS DOUBLE) / CAST(wt AS DOUBLE))
                         * CAST(200000 AS DOUBLE)) AS BIGINT) AS src_budget
            FROM w, sw),
      sized AS (SELECT doc_id, source,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents
                     WHERE text IS NOT NULL AND source IS NOT NULL),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "source", "n_tokens"), "sized")},
      o AS (SELECT doc_id, source, n_tokens,
              CAST(row_number() OVER (PARTITION BY source ORDER BY fh, doc_id)
                AS BIGINT) AS src_pos,
              CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS src_cum
            FROM f WHERE n_tokens > 0)
      SELECT o.doc_id, o.source, o.n_tokens, o.src_pos, o.src_cum,
             CAST(COALESCE(alloc.src_budget, 0) AS BIGINT) AS src_budget,
             (o.src_cum - o.n_tokens < COALESCE(alloc.src_budget, 0)) AS kept
      FROM o LEFT JOIN alloc USING (source)
      ORDER BY o.source, o.src_pos"""))

  /** C109: length-bucketed batching at a 4096-token padded budget.
    * The oracle ranks within each ⌊log₂⌋ bucket directly (DuckDB can
    * afford the per-bucket window; the Spark side's two-pass
    * sub-bucket prefix sum must land the IDENTICAL rank for every doc
    * or batch boundaries shift and the hash breaks). */
  val qPackLengthBuckets = Q(
    "qpack_length_buckets",
    (s, dir) => {
      Curation.packLengthBuckets(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          budget = 4096L)
        .orderBy(col("bucket"), col("rank"))
    },
    Some(s"""
      WITH sized AS (SELECT doc_id,
                       CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                     FROM documents WHERE text IS NOT NULL),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens"), "sized")},
      b AS (SELECT doc_id, n_tokens,
              CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket,
              fh
            FROM f WHERE n_tokens > 0),
      r AS (SELECT doc_id, n_tokens, bucket,
              CAST((1::BIGINT << (bucket + 1)) - 1 AS BIGINT) AS bucket_cap,
              CAST(row_number() OVER (PARTITION BY bucket ORDER BY fh, doc_id)
                AS BIGINT) AS rank
            FROM b),
      c AS (SELECT *, GREATEST(4096 // bucket_cap, 1) AS capacity FROM r)
      SELECT doc_id, n_tokens, bucket, bucket_cap, rank,
             (rank - 1) // capacity AS batch_id,
             (rank - 1) % capacity AS batch_pos
      FROM c
      ORDER BY bucket, rank"""))

  /** The end-to-end curation story in ONE oracle-checked query:
    * language filter → length filter → exact dedup → deterministic 50%
    * sample. Every filter is INTEGER-exact (predicted-language argmax
    * over hit counts, token count, md5 group, FNV bucket) — the float
    * quality score deliberately stays out of the cut line (known 1-ulp
    * round-boundary rows at sf0.001 would make the gate flaky). */
  val qPipeline = Q(
    "qcuration_pipeline",
    (s, dir) => {
      import graft.functions.TextFunctions
      val docs = Tables(s, dir).documents
      // persisted: referenced twice (dedup group side + join probe) and
      // the langid regexes are the scan's cost center — without the
      // boundary both consumers re-run them on the raw scan
      val filtered = docs.filter(
        TextFunctions.langId(col("text")) === "en" &&
        TextFunctions.tokenCountWs(col("text")) >= 30)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keep = Dedup.exactDedup(filtered, col("doc_id"), col("text"))
      val kept = filtered.join(keep, "doc_id")
        .select(col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      Curation.sampleByHash(kept, col("doc_id"), pct = 50, salt = "pipeline")
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.functions.{TextFunctions, TextQueries}
      val profiles = TextFunctions.StopwordProfiles.toMap
      s"""
      WITH lh AS (SELECT doc_id, text,
              ${TextQueries.langHitsSql(profiles("en"))} AS en,
              ${TextQueries.langHitsSql(profiles("de"))} AS de,
              ${TextQueries.langHitsSql(profiles("es"))} AS es,
              ${TextQueries.langHitsSql(profiles("fr"))} AS fr,
              CAST(length(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS zh,
              CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
      flt AS (SELECT doc_id, text, n_tokens FROM lh
              WHERE en = GREATEST(en, de, es, fr, zh) AND n_tokens >= 30),
      ded AS (SELECT MIN(doc_id) AS doc_id FROM flt
              GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
      kept AS (SELECT f.doc_id, f.n_tokens FROM flt f JOIN ded USING (doc_id)),
      ${fnvKeyCtes("pipeline", carry = "n_tokens", src = "kept")}
      SELECT doc_id, n_tokens, ((sb % 100) + 100) % 100 AS bucket
      FROM g
      WHERE ((sb % 100) + 100) % 100 < 50
      ORDER BY doc_id"""
    })

  /** The deduped corpus itself: survivors after dropping non-canonical
    * near-dup cluster members. Completes the C14 story (pairs →
    * clusters → applied drop set) under one oracle. */
  val qApply = Q(
    "qdedup_apply",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val cl = Curation.clusters(pairs, col("doc_a"), col("doc_b"))
      Curation.applyClusters(t.documents, col("doc_id"), cl)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      drops AS (SELECT doc_id FROM cc WHERE doc_id != cluster_id)
      SELECT doc_id, lang FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)
      ORDER BY doc_id"""))

  /** Quality-aware dedup end-cap: same cluster resolution as
    * qdedup_apply, but each cluster keeps its LONGEST member
    * (n_chars desc, doc_id asc) instead of its minimum id. The score
    * is an integer column so the keep/drop boundary is exact in both
    * engines. */
  val qApplyBest = Q(
    "qdedup_apply_best",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val cl = Curation.clusters(pairs, col("doc_a"), col("doc_b"))
      Curation.applyClustersBest(t.documents, col("doc_id"), col("n_chars"), cl)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      sc AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars
             FROM cc JOIN documents d USING (doc_id)),
      win AS (SELECT doc_id,
                row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM sc),
      drops AS (SELECT doc_id FROM win WHERE rn > 1)
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)
      ORDER BY doc_id"""))

  /** Benchmark decontamination (C22): every 97th document stands in as
    * the "benchmark"; any corpus doc sharing an 8-gram with it is
    * flagged with its distinct shared-gram count. Self-overlap makes
    * eval docs their own strongest hits, and near-dups of eval docs
    * surface too — exactly the leakage the check exists to find. */
  val qContam = Q(
    "qcuration_contam",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Curation.contamination(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") % 97 === 0), col("text"), n = 8)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 7)) AS u(i)
        WHERE len(t) >= 8),
      eg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
      SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS shared_grams
      FROM grams g JOIN eg USING (gram)
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""))

  /** The preprocessing story composed in ONE oracle-checked query
    * (C32): Gopher rule gate → PII scrub → split assignment. Every
    * stage reuses ITS OWN proven single definition — the gate is
    * `gopherRules`' integer-exact conjunction (SQL side: the shared
    * GopherMCte/GopherPassSql), the scrub is the C21 regex chain with
    * the same pattern literals in both engines, and the split is the
    * shared FNV bucket recipe — so a mismatch isolates the stage, not
    * the composition. PII is injected per doc (the corpus carries
    * none) so the scrub stage transforms every surviving row. */
  val qPreprocess = Q(
    "qcuration_preprocess",
    (s, dir) => {
      import graft.functions.TextFunctions
      val docs = Tables(s, dir).documents
      val id = col("doc_id").cast("string")
      val injected = concat(col("text"),
        lit(" Contact user"), id, lit("@example.com via https://ex.io/u/"), id,
        lit(" or +1 (555) 000-"), lpad(id, 4, "0"))
      val kept = TextFunctions.gopherGate(
          docs.select(col("doc_id"), col("text")), col("text"),
          minTokens = 50, maxTokens = 100000, minMeanLen = 4, maxMeanLen = 10,
          minStopwords = 1) // see qtext_gopher: this corpus has ONE stopword
        .filter(col("passes"))
        .select(col("doc_id"), col("n_tokens"),
          TextFunctions.redactPii(injected).as("clean"))
      Curation.splitByHash(kept, col("doc_id"),
          splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.functions.{TextFunctions, TextQueries}
      val (u, e, p) =
        (TextFunctions.UrlPattern, TextFunctions.EmailPattern, TextFunctions.PhonePattern)
      s"""
      WITH ${TextQueries.GopherMCte},
      flt AS (SELECT doc_id, n_tokens FROM m WHERE ${TextQueries.GopherPassSql}),
      inj AS (SELECT d.doc_id, f.n_tokens,
                d.text || ' Contact user' || CAST(d.doc_id AS VARCHAR) ||
                '@example.com via https://ex.io/u/' || CAST(d.doc_id AS VARCHAR) ||
                ' or +1 (555) 000-' || lpad(CAST(d.doc_id AS VARCHAR), 4, '0') AS t
              FROM documents d JOIN flt f ON d.doc_id = f.doc_id),
      sc AS (SELECT doc_id, n_tokens,
               regexp_replace(regexp_replace(regexp_replace(t,
                 '$u', '<URL>', 'g'), '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g') AS clean
             FROM inj),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'split:' || CAST(doc_id AS VARCHAR)", Seq("doc_id", "n_tokens", "clean"), "sc")}
      SELECT doc_id, n_tokens, clean, ((sb % 100) + 100) % 100 AS bucket,
        CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
             WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM g
      ORDER BY doc_id"""
    })

  /** Temperature mixture plan (C59), α = ½ over per-source char
    * totals against a 10⁹-token budget. The oracle mirrors the sqrt →
    * round-to-micro → share-division → trunc(share·budget) chain
    * op-for-op: sqrt is IEEE-correctly-rounded and the rest is one
    * rounding + two deterministic double ops, so every column is
    * bit-identical across engines. */
  val qMixPlan = Q(
    "qmix_plan",
    (s, dir) => {
      Curation.mixturePlan(
          Tables(s, dir).documents,
          col("source"), col("n_chars"), budget = 1000000000L, sqrtTimes = 1)
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source),
      w AS (SELECT *, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                        AS w_micro FROM t),
      s AS (SELECT SUM(w_micro) AS wt FROM w),
      p AS (SELECT source, n_docs, n_tokens, w_micro,
              CAST(w_micro AS DOUBLE) / CAST(wt AS DOUBLE) AS share
            FROM w, s),
      a AS (SELECT *, CAST(trunc(share * CAST(1000000000 AS DOUBLE)) AS BIGINT)
                        AS alloc_tokens FROM p)
      SELECT source, n_docs, n_tokens, w_micro, share, alloc_tokens,
        CAST(alloc_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs
      FROM a ORDER BY source"""))

  /** Corpus snapshot diff (C63): two versions derived
    * deterministically from `documents` by doc_id residue — the old
    * snapshot lacks residue-0 docs (added later), the new snapshot
    * lacks residue-1 (removed) and rewrites residue-2's text
    * (changed) — then diffed by md5 content digest. The oracle
    * mirrors the operator op-for-op (digest both sides, full outer
    * join, when-chain) rather than shortcutting to the residues, so
    * the digest-comparison path itself is what's checked. */
  val qCorpusDiff = Q(
    "qcorpus_diff",
    (s, dir) => {
      val d = Tables(s, dir).documents
      val old = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val neu = d.filter(pmod(col("doc_id"), lit(10)) =!= 1)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) === 2,
            concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
      Curation.corpusDiff(old, neu, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH old AS (SELECT doc_id, md5(text) AS h, TRUE AS in_old
                   FROM documents WHERE doc_id % 10 <> 0),
      neu AS (SELECT doc_id,
                md5(CASE WHEN doc_id % 10 = 2 THEN text || ' [v2]'
                         ELSE text END) AS h, TRUE AS in_new
              FROM documents WHERE doc_id % 10 <> 1)
      SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        CASE WHEN old.in_old IS NULL THEN 'added'
             WHEN neu.in_new IS NULL THEN 'removed'
             WHEN old.h IS NOT DISTINCT FROM neu.h THEN 'unchanged'
             ELSE 'changed' END AS status
      FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      ORDER BY doc_id"""))

  /** Temporal split over events (C66): train on the first 80% of the
    * time RANGE, validate on the next 10%, test on the future tail —
    * boundaries derived by integer range fractions (exact longs in
    * both engines; an empirical-quantile cut would hang parity on
    * float interpolation order). The boundary derivation is a 1-row
    * min/max scalar fetch (the zorder stats idiom), never a corpus
    * collect; the split itself is a map-side when-chain. */
  // C66b: the quantile-cut temporal split — the 100 TB boundary
  // policy (range fractions of [min, max] hand a burst-heavy corpus's
  // whole row mass to one window). Approximate cut selection → no
  // DuckDB oracle (the q10b discipline: driver records rows-only);
  // CurationSpec pins the cuts to the exact ECDF on a skewed fixture
  // and the tie/NULL/empty contracts.
  val qSplitTemporalQ = Q(
    "qsplit_temporal_q",
    (s, dir) => {
      val ev = Tables(s, dir).events.select(expr("ts div 1000").as("ts_us"))
      Curation.splitByTimeQuantile(ev, col("ts_us"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("min_ts_us"),
          max(col("ts_us")).as("max_ts_us"))
        .orderBy(col("split"))
    },
    None)

  val qSplitTemporal = Q(
    "qsplit_temporal",
    (s, dir) => {
      val ev = Tables(s, dir).events
        .select(expr("ts div 1000").as("ts_us"))
      val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      // empty events / all-NULL ts: no range to derive — fall back to
      // arbitrary cuts instead of a getLong NPE (the writeZOrdered
      // null-stats rule). Rows never reach a real label through the
      // fallback: an empty frame groups to nothing, and all-NULL ts
      // rows get splitByTime's NULL split.
      val (mn, mx) =
        if (b.isNullAt(0) || b.isNullAt(1)) (0L, 10L) else (b.getLong(0), b.getLong(1))
      val cut = (f: Long) => mn + (mx - mn) * f / 10L
      Curation.splitByTime(ev, col("ts_us"),
          Seq("train" -> cut(8), "val" -> cut(9)), tailLabel = "test")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("min_ts_us"),
          max(col("ts_us")).as("max_ts_us"))
        .orderBy(col("split"))
    },
    Some("""
      WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                 FROM events),
      lab AS (SELECT epoch_us(ts) AS u,
                CASE WHEN ts IS NULL THEN NULL
                     WHEN epoch_us(ts) < mn + ((mx - mn) * 8) // 10 THEN 'train'
                     WHEN epoch_us(ts) < mn + ((mx - mn) * 9) // 10 THEN 'val'
                     ELSE 'test' END AS split
              FROM events CROSS JOIN b)
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(MIN(u) AS BIGINT) AS min_ts_us,
        CAST(MAX(u) AS BIGINT) AS max_ts_us
      FROM lab GROUP BY split ORDER BY split"""))

  /** The full web-corpus recipe (C67): inject → NFC-normalize →
    * encoding gate → PII scrub → exact dedup → split, each stage
    * exercised by a disjoint doc-id residue class so NONE is vacuous:
    * residues 1 and 2 get the SAME text in decomposed vs precomposed
    * Unicode — they dedup into one survivor ONLY because NFC ran
    * first (the reason the normalize stage leads every hash-keyed
    * recipe); residue 3 gets a U+FFFD and dies at the encoding gate;
    * residue 4 gets a per-doc email the scrub redacts. The whole
    * chain before the dedup shuffle is ONE codegen map stage (NFC +
    * artifact gate + scrub are all column exprs — the frame APIs'
    * shared column cores compose without join-backs); dedup and
    * split are the proven C1/C30 shapes. The oracle rebuilds the
    * pipeline stage-for-stage from the same shared regex/CTE
    * constants the per-stage oracles prove. */
  val qRecipe = Q(
    "qcuration_recipe",
    (s, dir) => {
      import graft.functions.TextFunctions
      val id = col("doc_id")
      val r = pmod(id, lit(12))
      // r1 is DECOMPOSED (e + U+0301), r2 PRECOMPOSED (U+00E9): same text,
      // different bytes — they dedup together ONLY because NFC runs first
      val injected = when(r === 1, lit("shared body cafe\u0301"))
        .when(r === 2, lit("shared body caf\u00E9"))
        .otherwise(concat(col("text"),
          when(r === 3, lit(" \uFFFD broken"))
            .when(r === 4,
              concat(lit(" mail u"), id.cast("string"), lit("@ex.org")))
            .otherwise(lit(""))))
      // persisted: the NFC + artifact-gate + scrub chain is the
      // expensive derived pipeline the Keywords caching note says to
      // persist — it feeds BOTH the dedup group build and the
      // survivors join, and recomputing four regex passes + NFC per
      // consumer would double the pipeline's cost (clearCache-managed
      // like the dedup signature caches)
      val prepped = Tables(s, dir).documents
        .select(id, TextFunctions.nfcNormalize(injected).as("t"))
        .filter(TextFunctions.isCleanText(col("t")))
        .select(id, TextFunctions.redactPii(col("t")).as("clean"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keep = Dedup.exactDedup(prepped, col("doc_id"), col("clean"))
      val survivors = prepped.join(keep, "doc_id")
      Curation.splitByHash(survivors, col("doc_id"),
          splits = Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("split"), col("clean"))
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.functions.TextFunctions
      val (u, e, p) =
        (TextFunctions.UrlPattern, TextFunctions.EmailPattern, TextFunctions.PhonePattern)
      s"""
      WITH inj AS (
        SELECT doc_id, CASE
            WHEN doc_id % 12 = 1 THEN 'shared body cafe' || chr(769)
            WHEN doc_id % 12 = 2 THEN 'shared body caf' || chr(233)
            ELSE text ||
              CASE WHEN doc_id % 12 = 3 THEN ' ' || chr(65533) || ' broken'
                   WHEN doc_id % 12 = 4
                   THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org'
                   ELSE '' END
          END AS t0
        FROM documents),
      nfc AS (SELECT doc_id, nfc_normalize(t0) AS t FROM inj),
      art AS (SELECT doc_id, t,
              CAST(length(t) - length(regexp_replace(t,
                '${TextFunctions.ReplChar}', '', 'g')) AS BIGINT) AS n_repl,
              CAST(length(t) - length(regexp_replace(t,
                '${TextFunctions.CtrlChar}', '', 'g')) AS BIGINT) AS n_ctrl,
              CAST((length(t) - length(regexp_replace(t,
                  '${TextFunctions.MojiPair}', '', 'g'))) / 2
                + (length(t) - length(regexp_replace(t,
                  '${TextFunctions.MojiTriple}', '', 'g'))) / 3
                AS BIGINT) AS n_moji
            FROM nfc),
      gate AS (SELECT doc_id, t FROM art
               WHERE n_repl + n_ctrl + n_moji = 0),
      scrub AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(t, '$u', '<URL>', 'g'),
            '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g') AS clean
        FROM gate),
      norm AS (SELECT doc_id, clean,
          md5(regexp_replace(lower(trim(clean)), '\\s+', ' ', 'g')) AS h
        FROM scrub),
      keep AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY h),
      surv AS (SELECT n.doc_id, n.clean FROM norm n JOIN keep k USING (doc_id)),
      ${fnvKeyCtes("split", carry = "clean", src = "surv")}
      SELECT doc_id,
        CASE WHEN ((sb % 100) + 100) % 100 < 90 THEN 'train'
             WHEN ((sb % 100) + 100) % 100 < 95 THEN 'val'
             ELSE 'test' END AS split, clean
      FROM g ORDER BY doc_id"""
    })

  /** Soft dedup (C80): the same cluster resolution as qdedup_apply,
    * resolved to per-doc sampling weights instead of a drop set —
    * each near-dup cluster contributes one document's worth of
    * expected mass; singletons weigh 1. The weight is ONE IEEE
    * division rounded once, so the oracle mirrors it exactly. */
  val qSoftDedup = Q(
    "qcuration_softdedup",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
      val cl = Curation.clusters(pairs, col("doc_a"), col("doc_b"))
      Curation.softDedupWeights(t.documents, col("doc_id"), cl)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.simhashPairCtes(3)},
      $ComponentCcCtes,
      cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
             FROM cc GROUP BY 1),
      m AS (SELECT cc.doc_id, cs.csize FROM cc JOIN cs USING (cluster_id))
      SELECT d.doc_id,
        COALESCE(m.csize, 1) AS cluster_size,
        ROUND(CAST(1 AS DOUBLE) / CAST(COALESCE(m.csize, 1) AS DOUBLE), 6)
          AS weight
      FROM documents d LEFT JOIN m USING (doc_id)
      ORDER BY doc_id"""))

  /** Domain-blocklist screen (C81): URLs injected per the qtext_domains
    * idiom — every doc links site{id%7}.example.com, every 5th doc
    * additionally links a ported, mixed-case subdomain of a blocked
    * domain. The blocklist blocks one exact host and one registered
    * domain (subdomain match), so both match modes are non-vacuous
    * and overlap on id%35 ties (MIN picks deterministically). */
  val qBlocklist = Q(
    "qcuration_blocklist",
    (s, dir) => {
      import s.implicits._
      val id = col("doc_id")
      val injected = concat(col("text"),
        lit(" https://Site"), (id % 7).cast("string"),
        lit(".Example.com/p/"), id.cast("string"),
        when(id % 5 === 0,
          concat(lit(" https://media.CDN.tracker.bad:8080/v?x="), id.cast("string")))
          .otherwise(lit("")))
      Curation.domainBlocklist(
          Tables(s, dir).documents.select(id, injected.as("t")),
          col("doc_id"), col("t"),
          Seq("site3.example.com", "tracker.bad").toDF("domain"), col("domain"))
        .orderBy(col("doc_id"))
    },
    Some {
      val h = graft.functions.TextFunctions.UrlHostPattern
      s"""
      WITH inj AS (
        SELECT doc_id,
          text || ' https://Site' || CAST(doc_id % 7 AS VARCHAR) ||
            '.Example.com/p/' || CAST(doc_id AS VARCHAR) ||
          CASE WHEN doc_id % 5 = 0
               THEN ' https://media.CDN.tracker.bad:8080/v?x=' || CAST(doc_id AS VARCHAR)
               ELSE '' END AS t
        FROM documents),
      d AS (SELECT doc_id,
              regexp_replace(lower(UNNEST(regexp_extract_all(t, '$h', 1))),
                ':[0-9]+$$', '') AS domain
            FROM inj),
      labs AS (SELECT doc_id, string_split(domain, '.') AS ls FROM d),
      sfx AS (SELECT doc_id,
                array_to_string(list_slice(ls, i + 1, len(ls)), '.') AS sfx
              FROM labs, UNNEST(range(0, len(ls) - 1)) AS u(i)
              WHERE len(ls) >= 2),
      bl AS (SELECT UNNEST(['site3.example.com', 'tracker.bad']) AS sfx),
      hit AS (SELECT s.doc_id, MIN(s.sfx) AS matched_domain
              FROM sfx s JOIN bl USING (sfx) GROUP BY 1)
      SELECT dd.doc_id, h2.matched_domain IS NOT NULL AS blocked,
             h2.matched_domain
      FROM documents dd LEFT JOIN hit h2 USING (doc_id)
      ORDER BY doc_id"""
    })

  /** DSIR importance weights (C89): target = the corpus's own English
    * slice (a stand-in for a curated reference set), raw = everything
    * — so the weights must separate en docs (target-like, high logw)
    * from the rest. Oracle mirrors the hashed-bigram models
    * stage-for-stage: the gram VOCAB is FNV-hashed once (the
    * fnvSignedCtes recipe over distinct grams, not instances) and the
    * per-bucket log ratio is the same single-rounded micro-nat term,
    * so the per-doc integer sums agree in any order. MATERIALIZED on
    * the fan-out CTEs keeps DuckDB from re-running the gram+hash
    * chain once per downstream reference (the verify-skill gotcha). */
  val qDsir = Q(
    "qcuration_dsir",
    (s, dir) => {
      val d = Tables(s, dir).documents
      Curation.dsirWeights(
          d, col("doc_id"), col("text"),
          d.filter(col("lang") === "en"), col("text"),
          n = 2, buckets = 4096)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tok AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
                   FROM documents),
      gr AS MATERIALIZED (SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
            FROM tok, UNNEST(range(1, len(w))) u(i)),
      gv AS (SELECT DISTINCT g FROM gr),
      ${graft.Q.sqlutil.fnvSignedCtes("ds", "'dsir:' || g", Seq("g"), "gv")},
      vb AS (SELECT g, ((sb % 4096) + 4096) % 4096 AS b FROM dsg),
      f AS MATERIALIZED (SELECT gr.doc_id, gr.lang, vb.b
           FROM gr JOIN vb USING (g)),
      cr AS MATERIALIZED (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr
           FROM f GROUP BY b),
      ct AS MATERIALIZED (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
           FROM f WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT (SELECT SUM(cr) FROM cr) AS nr,
                     (SELECT COALESCE(SUM(ct), 0) FROM ct) AS nt),
      r AS (SELECT cr.b,
              CAST(ROUND(ln((CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) * CAST(nr + 4096 AS DOUBLE)) /
                            (CAST(cr.cr + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))) * 1000000) AS BIGINT) AS rm
            FROM cr LEFT JOIN ct USING (b) CROSS JOIN tot),
      dc AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
             FROM f GROUP BY doc_id, b),
      sc AS (SELECT dc.doc_id, SUM(dc.c) AS nf, SUM(dc.c * r.rm) AS lw
             FROM dc JOIN r USING (b) GROUP BY dc.doc_id)
      SELECT d.doc_id, CAST(COALESCE(sc.nf, 0) AS BIGINT) AS n_feats,
             CAST(COALESCE(sc.lw, 0) AS BIGINT) AS logw_micro,
             CASE WHEN sc.nf IS NULL THEN NULL
                  ELSE CAST(sc.lw AS DOUBLE) / 1000000 END AS logw
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY d.doc_id"""))

  /** DSIR resampling end-cap (C103): the operation C89's weights
    * exist FOR — draw the 100 most-target-like docs, sampled without
    * replacement proportional to exp(logw), via the Gumbel-top-k key
    * (log space end to end: DSIR log-weights are negative and large,
    * exponentiation would under/overflow). Featureless docs
    * (n_feats = 0) carry no importance estimate and are excluded
    * BEFORE keying. The oracle composes the proven DSIR chain as a
    * subquery (referenced once) with the FNV u-derivation and the
    * same round-once Gumbel arithmetic; the ranking key is an exact
    * integer sum, so the top-100 boundary transfers exactly. */
  val qDsirSample = Q(
    "qcuration_dsir_sample",
    (s, dir) => {
      val d = Tables(s, dir).documents
      val w = Curation.dsirWeights(d, col("doc_id"), col("text"),
          d.filter(col("lang") === "en"), col("text"), n = 2, buckets = 4096)
        .filter(col("n_feats") > 0)
        .select(col("doc_id"), col("logw_micro"))
      Curation.sampleByLogWeight(w, col("doc_id"), col("logw_micro"), k = 100)
        .select(col("sample_rank"), col("doc_id"), col("logw_micro"),
          col("gumbel_key_micro"))
        .orderBy(col("sample_rank"))
    },
    Some(s"""
      WITH dw AS (SELECT doc_id, logw_micro FROM (${qDsir.oracle.get}) t
                  WHERE n_feats > 0),
      ${graft.Q.sqlutil.fnvSignedCtes("gb",
        "'gumbel:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "logw_micro"), "dw")},
      keyed AS (SELECT doc_id, logw_micro,
          logw_micro + CAST(ROUND(-LN(-LN(
            (CAST(((sb % 9007199254740992) + 9007199254740992) % 9007199254740992
                  AS DOUBLE) + 0.5) / 9007199254740992.0)) * 1e6) AS BIGINT) AS gk
        FROM gbg)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY gk DESC, doc_id) AS BIGINT) AS sample_rank,
             doc_id, logw_micro, gk AS gumbel_key_micro
      FROM keyed
      ORDER BY gk DESC, doc_id LIMIT 100"""))

  /** Semantic decontamination (C90): the eval set IS a corpus slice
    * (vec_id < 10 — planted leakage), so the 10 planted vectors
    * self-match at cosine 1.0 and must flag at 0.95 while the rest of
    * the corpus (max non-self cosine ≈ 0.49 on this data) must not.
    * Cosine/argmax parity is the proven qann_brute_topk formulation;
    * the flag compares the unrounded cosine in both engines. */
  val qContamSem = Q(
    "qcuration_contam_sem",
    (s, dir) => {
      val e = Tables(s, dir).embeddings
      Curation.contaminationSemantic(
          e, col("vec_id"), col("embedding"),
          e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
          threshold = 0.95)
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      ev AS (SELECT vec_id AS eval_id, v FROM e WHERE vec_id < 10),
      sc AS (SELECT c.vec_id, ev.eval_id,
               list_cosine_similarity(c.v, ev.v) AS cos
             FROM e c CROSS JOIN ev),
      top AS (SELECT vec_id, eval_id AS nearest_eval_id, cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, eval_id) AS rn
             FROM sc)
      SELECT e.vec_id, COALESCE(t.cos >= 0.95, FALSE) AS contaminated,
             t.nearest_eval_id, ROUND(t.cos, 4) AS max_cosine
      FROM e LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (vec_id)
      ORDER BY e.vec_id"""))

  /** Span-level contamination audit (C112): same eval set as
    * qcuration_contam (every 97th doc), but the output is the WHERE —
    * maximal merged token spans of 8-gram overlap. The oracle matches
    * gram STRINGS where Spark matches xxhash64 hashes (the C22
    * argument: counting/merging hashes equals strings up to ~1e-11
    * collision odds) and mirrors the lag-flag/running-sum island
    * merge window-for-window. */
  val qContamSpans = Q(
    "qcuration_contam_spans",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Curation.contaminationSpans(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") % 97 === 0), col("text"), n = 8)
        .orderBy(col("doc_id"), col("span_start"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 7)) AS u(i)
        WHERE len(t) >= 8),
      eg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
      h AS (SELECT g.doc_id, g.pos FROM grams g JOIN eg USING (gram)),
      fl AS (SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
                    THEN 1 ELSE 0 END AS fstart
             FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      sp AS (SELECT doc_id, pos,
               SUM(fstart) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_idx
             FROM fl)
      SELECT doc_id, MIN(pos) AS span_start,
             CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
             CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM sp GROUP BY doc_id, span_idx
      ORDER BY doc_id, span_start"""))

  /** Contamination removal (C115): same eval set as qcuration_contam /
    * _spans (every 97th doc), but the output is the SURGERY — each doc
    * rewritten with eval-matched 8-gram coverage deleted. The oracle
    * mirrors qdedup_passage_rm's proven rewrite formulation with the
    * dup-gram rule swapped for the eval join; untouched docs must come
    * back byte-identical, fully-contaminated (eval member) docs empty. */
  val qContamRm = Q(
    "qcuration_contam_rm",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Curation.contaminationRemove(docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") % 97 === 0), col("text"), n = 8)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 7)) AS u(i)
        WHERE len(t) >= 8),
      eg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
      cov AS (SELECT DISTINCT g.doc_id, g.pos + j AS p
              FROM grams g JOIN eg USING (gram), UNNEST(range(0, 8)) AS v(j)),
      cl AS (SELECT doc_id, list(p) AS cov FROM cov GROUP BY doc_id),
      k AS (SELECT toks.doc_id, toks.text, toks.t, COALESCE(cl.cov, []) AS cov
            FROM toks LEFT JOIN cl USING (doc_id)),
      r AS (SELECT doc_id, text, t, cov,
              [t[CAST(i + 1 AS BIGINT)] FOR i IN range(0, len(t)) IF NOT list_contains(cov, i)] AS kept
            FROM k)
      SELECT doc_id,
        CASE WHEN len(cov) = 0 THEN text
             ELSE COALESCE(array_to_string(kept, ' '), '') END AS clean,
        CAST(len(t) - len(kept) AS BIGINT) AS removed_tokens
      FROM r ORDER BY doc_id"""))

  /** One-call epoch assembly (C113): mixture plan at α = ½ over a
    * 15k-token budget (every source truncates at this corpus — the
    * keep-everything branch is qmix_apply's), per-source cap in
    * salted-FNV order, 1500-token shard packing, shard manifest. The
    * oracle chains the three proven formulations (qmix_plan's
    * sqrt/share/trunc arithmetic, qmix_apply's per-source running-sum
    * cut, qpack_shards' unsigned-FNV global prefix sum) into one
    * end-to-end check — a mismatch in ANY stage moves shard
    * boundaries and breaks the hash. */
  val qPackEpoch = Q(
    "qpack_epoch",
    (s, dir) => {
      Curation.epochPack(
          Tables(s, dir).documents,
          col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")),
          col("source"),
          tokenBudget = 15000L, sqrtTimes = 1, shardBudget = 1500L)
        .orderBy(col("shard"))
    },
    Some(s"""
      WITH tok AS (SELECT doc_id, source, text,
                     CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
      t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS s_tokens
            FROM tok GROUP BY source),
      w AS (SELECT source,
              CAST(ROUND(sqrt(CAST(s_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w_micro
            FROM t),
      sw AS (SELECT SUM(w_micro) AS wt FROM w),
      alloc AS (SELECT source,
              CAST(trunc((CAST(w_micro AS DOUBLE) / CAST(wt AS DOUBLE))
                         * CAST(15000 AS DOUBLE)) AS BIGINT) AS src_budget
            FROM w, sw),
      sized AS (SELECT doc_id, source, n_tokens FROM tok
                WHERE text IS NOT NULL AND source IS NOT NULL),
      ${graft.Q.sqlutil.fnvSignedCtes("",
        "'shuffle:' || CAST(doc_id AS VARCHAR)",
        Seq("doc_id", "source", "n_tokens"), "sized")},
      o AS (SELECT doc_id, source, n_tokens, fh,
              CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS src_cum
            FROM f WHERE n_tokens > 0),
      kept AS (SELECT o.doc_id, o.source, o.n_tokens, o.fh
               FROM o LEFT JOIN alloc USING (source)
               WHERE o.src_cum - o.n_tokens < COALESCE(alloc.src_budget, 0)),
      p AS (SELECT doc_id, source, n_tokens,
              CAST(row_number() OVER (ORDER BY fh, doc_id) AS BIGINT) AS pos,
              CAST(SUM(n_tokens) OVER (ORDER BY fh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM kept),
      sh AS (SELECT *, (cum - n_tokens) // 1500 AS shard FROM p)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             MIN(pos) AS first_pos, MAX(pos) AS last_pos
      FROM sh GROUP BY shard ORDER BY shard"""))

  val all: Seq[Q] = Seq(qSampleHash, qSampleMix, qSampleGroupTopK, qClusters,
    qClustersStar, qApply, qApplyBest, qPackShards, qPackSequences,
    qPackLengthBuckets, qSourceCap, qMixApply, qPipeline,
    qContam, qSplit, qSplitClustered, qSampleBudget, qPreprocess, qMixPlan,
    qCorpusDiff, qSplitTemporal, qSplitTemporalQ, qRecipe, qSoftDedup,
    qBlocklist, qSampleWeighted,
    qSampleWeightedGroup, qDsir, qDsirSample, qContamSem, qContamSpans,
    qContamRm, qPackEpoch, qSplitLeakage, qSplitLeakageCl, qCorpusPatch,
    qSplitStratified, qDedupReport, qNeyman, qMixTemperature,
    qMixTemperature75, qPackManifest, qPackCurriculum, qSampleRecency)
}
