package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-backed dedup queries over `documents`/`embeddings`
  * (SURVEY.md §2.C1-C5). The DuckDB oracles for the near-dup variants
  * compute the ground truth by brute force (feasible at the sf0.01
  * oracle scale), so they also double as recall proofs for the
  * candidate-generation paths. */
object DedupQueries {

  val qExact = Q(
    "qdedup_exact",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.exactGroups(t.documents, col("doc_id"), col("text"))
        .orderBy(col("content_hash"))
    },
    Some("""
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
             MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY content_hash"""))

  private val BruteJaccardSql = """
      WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      sh AS (SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, length(w))]) s
             FROM d),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               length(list_intersect(a.s, b.s)) AS n_inter,
               ROUND(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
                     / length(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard
      FROM pairs
      WHERE n_inter > 0 AND jaccard >= 0.5
      ORDER BY doc_a, doc_b"""

  val qNgram = Q(
    "qdedup_ngram_jaccard",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.ngramJaccardPairs(t.documents, col("doc_id"), col("text"), n = 2, threshold = 0.5)
        .transform(Q.orderedDump(_, col("doc_a"), col("doc_b")))
    },
    Some(BruteJaccardSql))

  /** C4b: the exact-collapse → near-dup two-stage pipeline as one
    * gated query. The oracle collapses exactly like `qdedup_exact`'s
    * (same md5-of-normalized-text groups, MIN keep_id, copy counts),
    * then runs the SAME brute Jaccard truth over the representatives
    * and attaches both sides' multiplicities — so the gate pins the
    * collapse, the restricted pairing AND the copy-count carry in one
    * hash. On this corpus every group is a singleton (copies 1/1),
    * which is the honest plumbing check; the dup-heavy law
    * (collapsed(m-dup corpus) ≡ plain(corpus) with copies = m, at
    * sf0.1-level cost on the 10× proxy) is spec-pinned in DedupSpec. */
  private val CollapsedBruteJaccardSql = """
      WITH g AS (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) h,
                   MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
                 FROM documents GROUP BY 1),
      reps AS (SELECT d.doc_id, d.text, g.n_copies
               FROM documents d JOIN g ON d.doc_id = g.keep_id),
      d AS (SELECT doc_id, string_split(text, ' ') w FROM reps),
      sh AS (SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, length(w))]) s
             FROM d),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               length(list_intersect(a.s, b.s)) AS n_inter,
               ROUND(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
                     / length(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT p.doc_a, p.doc_b, p.jaccard,
             ga.n_copies AS copies_a, gb.n_copies AS copies_b
      FROM pairs p
      JOIN g ga ON ga.keep_id = p.doc_a
      JOIN g gb ON gb.keep_id = p.doc_b
      WHERE p.n_inter > 0 AND p.jaccard >= 0.5
      ORDER BY doc_a, doc_b"""

  val qNgramCollapsed = Q(
    "qdedup_ngram_collapsed",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.ngramJaccardPairsCollapsed(t.documents, col("doc_id"), col("text"),
          n = 2, threshold = 0.5)
        .transform(Q.orderedDump(_, col("doc_a"), col("doc_b")))
    },
    Some(CollapsedBruteJaccardSql))

  /** C2b: the collapse applied to the MinHash-LSH family. Same brute
    * collapsed truth as C4b's oracle — at 32 bands × 2 rows the LSH
    * candidate recall at J=0.5 is ≈0.9999 (the qdedup_minhash_lsh
    * argument), so equality against the exact truth is forced and the
    * oracle doubles as a recall gate over the collapsed path. */
  val qMinhashCollapsed = Q(
    "qdedup_minhash_collapsed",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.minhashLshPairsCollapsed(t.documents, col("doc_id"), col("text"),
          n = 2, bands = 32, rows = 2, threshold = 0.5)
        .transform(Q.orderedDump(_, col("doc_a"), col("doc_b")))
    },
    Some(CollapsedBruteJaccardSql))

  // MinHash-LSH at 32 bands × 2 rows: P(candidate | j=0.5) ≈ 1-0.75^32
  // ≈ 0.9999, so on this data the verified output equals the brute-force
  // truth — the same oracle doubles as a 100%-recall check.
  val qMinhash = Q(
    "qdedup_minhash_lsh",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.minhashLshPairs(t.documents, col("doc_id"), col("text"),
          n = 2, bands = 32, rows = 2, threshold = 0.5)
        .transform(Q.orderedDump(_, col("doc_a"), col("doc_b")))
    },
    Some(BruteJaccardSql))

  /** Full-parity simhash oracle: tokens hashed with FNV-1a (list_reduce
    * + HUGEINT mod-2⁶⁴ — bit-identical to graft's fnv1a64 expression,
    * proven on the published test vectors), 64 per-bit vote sums, and
    * brute-force all-pairs Hamming ≤ maxDist as the truth the banded
    * Spark path must equal (the pigeonhole banding is complete and no
    * sf0.01 bucket reaches the cap, so equality MUST hold). ASCII-only
    * corpus assumption as in qtext_fingerprint's oracle.
    *
    * Shaped as a reusable CTE chain (ends in a `pairs(doc_a, doc_b,
    * hamming)` CTE already filtered to ≤ maxDist) so downstream
    * oracles — e.g. `qdedup_clusters`' recursive component
    * resolution — can build on the same proven truth. */
  private[operators] def simhashPairCtes(maxDist: Int): String = {
    // BigInt, not 1L << j: at j=63 a Long literal interpolates as
    // -2^63 and the oracle's sign-bit vote would be dead
    val votes = (0 until 64).map { j =>
      val bit = BigInt(1) << j
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // $bit::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN $bit::HUGEINT ELSE 0::HUGEINT END)"
    }.mkString(" + ")
    s"""d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      th AS (SELECT doc_id,
               list_transform(w, t ->
                 list_reduce(
                   list_prepend(CAST(14695981039346656037 AS HUGEINT),
                                list_transform(range(1, length(t)+1), i -> CAST(ord(substring(t, i, 1)) AS HUGEINT))),
                   (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT)) AS hs
             FROM d),
      sig AS (SELECT doc_id, ($votes) AS s FROM th),
      sigb AS (SELECT doc_id,
                 CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                      THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS sb
               FROM sig),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(bit_count(xor(a.sb, b.sb)) AS BIGINT) AS hamming
                FROM sigb a JOIN sigb b ON a.doc_id < b.doc_id
                WHERE bit_count(xor(a.sb, b.sb)) <= $maxDist)"""
  }

  private def simhashOracleSql(maxDist: Int): String =
    s"""
      WITH ${simhashPairCtes(maxDist)}
      SELECT doc_a, doc_b, hamming FROM pairs
      ORDER BY doc_a, doc_b"""

  val qSimhash = Q(
    "qdedup_simhash",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.simhashPairs(t.documents, col("doc_id"), col("text"), maxDist = 3)
        .transform(Q.orderedDump(_, col("doc_a"), col("doc_b")))
    },
    Some(simhashOracleSql(maxDist = 3)))

  /** C146: the cross-source duplication matrix over the SAME simhash
    * pair chain the cluster/report queries consume — per canonical
    * source pair, how many near-dup pairs cross it and the rate
    * against possible pairs. Oracle: the proven pair CTEs + the
    * doc→source fold + the mirrored one-tree rate. */
  val qSourceMatrix = Q(
    "qdedup_source_matrix",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"),
        maxDist = 3)
      graft.operators.Profile.crossSourceDupMatrix(pairs, t.documents,
          col("doc_id"), col("source"))
        .transform(Q.orderedDump(_, col("source_a"), col("source_b")))
    },
    Some(s"""
      WITH ${simhashPairCtes(maxDist = 3)},
      ds AS (SELECT doc_id, source FROM documents),
      j AS (SELECT least(a.source, b.source) AS source_a,
                   greatest(a.source, b.source) AS source_b
            FROM pairs p JOIN ds a ON a.doc_id = p.doc_a
                         JOIN ds b ON b.doc_id = p.doc_b),
      m AS (SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM j GROUP BY 1, 2),
      sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
             FROM documents GROUP BY source)
      SELECT m.source_a, m.source_b, m.n_pairs,
             ROUND(CAST(m.n_pairs AS DOUBLE) /
                   (CASE WHEN m.source_a = m.source_b
                         THEN CAST(a.n AS DOUBLE) * (a.n - 1) / 2
                         ELSE CAST(a.n AS DOUBLE) * b.n END), 9) AS pair_rate
      FROM m JOIN sz a ON a.source = m.source_a
             JOIN sz b ON b.source = m.source_b
      ORDER BY source_a, source_b"""))

  val qEmbedding = Q(
    "qdedup_embedding",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.embeddingCosinePairs(t.embeddings, col("vec_id"), col("embedding"), threshold = 0.4)
        .transform(Q.orderedDump(_, col("vec_a"), col("vec_b")))
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cosine
      FROM pairs
      WHERE cosine >= 0.4
      ORDER BY vec_a, vec_b"""))

  /** Full algorithm-parity oracle for the LSH embedding-pair path: the
    * deterministic hyperplanes are embedded as double literals
    * (Double.toString round-trips bit-exactly) and each signature dot is
    * a LEFT-ASSOCIATED sum chain matching `graft_vec_dot`'s accumulation
    * order — identical float64 signs ⇒ identical buckets ⇒ identical
    * candidate pairs (the recipe qann_lsh_bucketed's green oracle
    * proved). The bucket cap is modeled too, so the oracle stays exact
    * even on a corpus where it binds. Recall below the exact
    * qdedup_embedding is BY DESIGN at this gapless 0.4 threshold — both
    * engines miss the same pairs, which is what the oracle checks. */
  private def lshPairOracleSql(dim: Int, tables: Int, planesPerTable: Int,
                               seed: Long, maxBucket: Int, threshold: Double,
                               srcCtes: String = "", src: String = "embeddings",
                               copiesFrom: Option[String] = None): String = {
    def chain(p: Seq[Double]): String =
      p.zipWithIndex.map { case (w, i) => s"v[${i + 1}]*($w)" }.mkString(" + ")
    val bcols = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(planesPerTable, dim, seed + t)
      val bits = planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN (${chain(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"($bits) AS b$t"
    }.mkString(", ")
    val unpivot = (0 until tables)
      .map(t => s"SELECT vec_id, $t AS table_id, b$t AS bucket FROM sig")
      .mkString(" UNION ALL ")
    val finalSelect = copiesFrom match {
      case Some(g) =>
        s"""SELECT s.vec_a, s.vec_b, s.cosine,
             ga.n_copies AS copies_a, gb.n_copies AS copies_b
           FROM scored s JOIN $g ga ON ga.keep_id = s.vec_a
                         JOIN $g gb ON gb.keep_id = s.vec_b
           WHERE s.cosine >= $threshold
           ORDER BY s.vec_a, s.vec_b"""
      case None =>
        s"""SELECT vec_a, vec_b, cosine
           FROM scored
           WHERE cosine >= $threshold
           ORDER BY vec_a, vec_b"""
    }
    s"""
      WITH $srcCtes e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM $src),
      sig AS (SELECT vec_id, $bcols FROM e),
      brows AS ($unpivot),
      capped AS (
        SELECT vec_id, table_id, bucket FROM (
          SELECT vec_id, table_id, bucket,
                 COUNT(*) OVER (PARTITION BY table_id, bucket) AS bucket_n
          FROM brows)
        WHERE bucket_n <= $maxBucket),
      cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM capped a JOIN capped b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
      scored AS (
        SELECT cand.vec_a, cand.vec_b,
               ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
        FROM cand
        JOIN e ea ON ea.vec_id = cand.vec_a
        JOIN e eb ON eb.vec_id = cand.vec_b)
      $finalSelect"""
  }

  val qEmbeddingLsh = Q(
    "qdedup_embedding_lsh",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.embeddingCosinePairsLsh(t.embeddings, col("vec_id"), col("embedding"),
          threshold = 0.4, dim = 64)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some(lshPairOracleSql(dim = 64, tables = 16, planesPerTable = 4,
      seed = 42L, maxBucket = 100000, threshold = 0.4)))

  /** The dup-union CTEs both C5b oracles share: every base vector
    * duplicated once under a shifted id, collapsed by GROUPING ON THE
    * EMBEDDING ITSELF (value equality — the same rule the Spark
    * collapse applies, no serialization format in between), keep-min
    * ids, copy counts, and the representative frame the pair search
    * runs over. Unlike C4b's corpus (all singletons at the gate), the
    * collapse here does real work IN the driver gate: every group is
    * a 2-dup set, so any slip in the collapse, the rep restriction or
    * the copy carry shifts the hash. */
  private val DupUnionCtes = """
      u AS (SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000, embedding FROM embeddings),
      g AS (SELECT embedding AS emb, MIN(vec_id) AS keep_id,
              CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM u GROUP BY embedding),
      reps AS (SELECT g.keep_id AS vec_id, u.embedding
               FROM u JOIN g ON u.vec_id = g.keep_id),"""

  /** C5b: the exact-collapse → near-dup pipeline reaching the
    * EMBEDDING family — built in direct response to the r17 sf1 full
    * sweep, where the naive pair listing scaled 13.2× on the
    * 10×-replica proxy (every vector a 10-dup set → 45 cosine-1.0
    * pairs each). The registered corpus is the base embeddings
    * UNIONED with a shifted-id copy of themselves, so the gate runs
    * the collapse against REAL 2-dup groups: output = exactly the
    * base qdedup_embedding pairs with copies 2/2, and the oracle
    * recomputes the whole chain (group-by-embedding collapse, rep
    * pairing, copy carry) rather than assuming the construction. */
  val qEmbeddingCollapsed = Q(
    "qdedup_embedding_collapsed",
    (s, dir) => {
      val e = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val dup = e.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
      Dedup.embeddingCosinePairsCollapsed(e.unionByName(dup),
          col("vec_id"), col("embedding"), threshold = 0.4)
        .transform(Q.orderedDump(_, col("vec_a"), col("vec_b")))
    },
    Some(s"""
      WITH $DupUnionCtes
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM reps),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT p.vec_a, p.vec_b, p.cosine,
             ga.n_copies AS copies_a, gb.n_copies AS copies_b
      FROM pairs p
      JOIN g ga ON ga.keep_id = p.vec_a
      JOIN g gb ON gb.keep_id = p.vec_b
      WHERE p.cosine >= 0.4
      ORDER BY vec_a, vec_b"""))

  /** C5c: the same collapse in front of the LSH candidate path — the
    * C2b index-protection argument for embeddings (m exact copies
    * share every signature, so bucket occupancy and the `maxBucket`
    * recall cap degrade with multiplicity, not corpus diversity). The
    * oracle is the FULL algorithm-parity LSH chain over the collapsed
    * representatives plus the recomputed copy carry. */
  val qEmbeddingLshCollapsed = Q(
    "qdedup_embedding_lsh_collapsed",
    (s, dir) => {
      val e = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val dup = e.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"))
      Dedup.embeddingCosinePairsLshCollapsed(e.unionByName(dup),
          col("vec_id"), col("embedding"), threshold = 0.4, dim = 64)
        .transform(Q.orderedDump(_, col("vec_a"), col("vec_b")))
    },
    Some(lshPairOracleSql(dim = 64, tables = 16, planesPerTable = 4,
      seed = 42L, maxBucket = 100000, threshold = 0.4,
      srcCtes = DupUnionCtes + "\n", src = "reps", copiesFrom = Some("g"))))

  /** SemDedup under a FULL algorithm-parity oracle: the k-means cells
    * are [[SimilarityQueries.trainedCellsCtes]]'s proven-identical
    * hash-seeded Lloyd chain, the within-cell pair cosines are the
    * qdedup_embedding formulation (raw-vector list_cosine_similarity vs
    * normalized-dot, both rounded to 4), and the survivor rule (drop
    * iff a smaller id in the same cell is ≥ threshold) is set algebra.
    * Output = the surviving (vec_id, cell) index. Same threshold-parity
    * caveat as qdedup_embedding (whose green history established the
    * formulation): the two engines' float paths differ below the
    * round(…, 4), so a pair landing within 1 ulp of a 0.00005 rounding
    * boundary could in principle flip across the cut — here that would
    * move a vec_id between the drop and survivor sets rather than
    * add/remove one reported pair. Deterministic per corpus; the gate
    * re-proves it on every run. */
  val qSemantic = Q(
    "qdedup_semantic",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.semDedup(t.embeddings, col("vec_id"), col("embedding"),
          nlist = 10, threshold = 0.45, iters = 1)
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      ${SimilarityQueries.trainedCellsCtes(nlist = 10, iters = 1)},
      p AS (SELECT b.vec_id AS vb,
              ROUND(list_cosine_similarity(ea.v, eb.v), 4) AS cos
            FROM cells0 a JOIN cells0 b ON a.grp = b.grp AND a.vec_id < b.vec_id
            JOIN e ea ON ea.vec_id = a.vec_id
            JOIN e eb ON eb.vec_id = b.vec_id),
      d AS (SELECT DISTINCT vb FROM p WHERE cos >= 0.45)
      SELECT c.vec_id, c.grp AS cell FROM cells0 c
      WHERE c.vec_id NOT IN (SELECT vb FROM d)
      ORDER BY vec_id"""))

  /** Incremental near-dedup (C33): every 10th doc stands in as the
    * "new batch", the rest as the historical corpus. Same 32×2 banding
    * as qdedup_minhash_lsh, so on this data the verified output equals
    * the bipartite brute-force truth — the oracle doubles as a recall
    * proof for the cross-side candidate generation. */
  val qIncremental = Q(
    "qdedup_incremental",
    (s, dir) => {
      val t = Tables(s, dir)
      val nw = t.documents.filter(col("doc_id") % 10 === 0)
      val old = t.documents.filter(col("doc_id") % 10 =!= 0)
      Dedup.minhashLshPairsAgainst(
          nw, col("doc_id"), col("text"),
          old, col("doc_id"), col("text"),
          n = 2, bands = 32, rows = 2, threshold = 0.5)
        .orderBy(col("new_id"), col("old_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      sh AS (SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, length(w))]) s
             FROM d),
      pairs AS (
        SELECT a.doc_id AS new_id, b.doc_id AS old_id,
               length(list_intersect(a.s, b.s)) AS n_inter,
               ROUND(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
                     / length(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
        FROM sh a JOIN sh b
          ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
      SELECT new_id, old_id, jaccard
      FROM pairs
      WHERE n_inter > 0 AND jaccard >= 0.5
      ORDER BY new_id, old_id"""))

  /** C34: per-doc duplicate-passage coverage at word-5-gram windows —
    * the oracle mirrors the operator stage for stage (positional grams,
    * per-(doc, gram) counts, distinct-doc frequency ≥ 2, map-side
    * window totals, left join for zero-window docs) so a mismatch
    * isolates the stage; all counts integer, one ROUND at the end. */
  val qPassage = Q(
    "qdedup_passage",
    (s, dir) =>
      Dedup.passageDupStats(Tables(s, dir).documents, col("doc_id"), col("text"), n = 5)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 5 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 4)) AS u(i)
        WHERE len(t) >= 5),
      c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram),
      f AS (SELECT gram FROM c GROUP BY gram HAVING COUNT(*) >= 2),
      dup AS (SELECT c.doc_id, SUM(c.cnt) AS dup_windows
              FROM c JOIN f ON c.gram = f.gram GROUP BY c.doc_id),
      tot AS (SELECT doc_id,
                CAST(GREATEST(len(string_split(text, ' ')) - 4, 0) AS BIGINT) AS n_windows
              FROM documents)
      SELECT t.doc_id, t.n_windows,
        CAST(COALESCE(d.dup_windows, 0) AS BIGINT) AS dup_windows,
        CASE WHEN t.n_windows = 0 THEN 0.0
             ELSE ROUND(CAST(COALESCE(d.dup_windows, 0) AS DOUBLE) / t.n_windows, 4)
        END AS dup_frac
      FROM tot t LEFT JOIN dup d ON d.doc_id = t.doc_id
      ORDER BY t.doc_id"""))

  /** Passage span removal (C41): the oracle mirrors the rewrite
    * byte-for-byte — positional 5-gram windows, distinct-doc ≥ 2 dup
    * rule, covered-token filter, single-space re-join, untouched docs
    * returned verbatim. */
  val qPassageRm = Q(
    "qdedup_passage_rm",
    (s, dir) =>
      Dedup.passageDupRemove(Tables(s, dir).documents, col("doc_id"), col("text"), n = 5)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 5 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 4)) AS u(i)
        WHERE len(t) >= 5),
      f AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS dc
                              FROM grams GROUP BY gram) WHERE dc >= 2),
      cov AS (SELECT DISTINCT g.doc_id, g.pos + j AS p
              FROM grams g JOIN f USING (gram), UNNEST(range(0, 5)) AS v(j)),
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

  /** Incremental EXACT screen (C1's index pair): docs ≤ 250 are the
    * indexed history; the increment is the remaining docs PLUS two
    * INJECTED replays of history docs (one byte-exact, one that only
    * the normalization collapses — leading spaces + upper-case), so
    * the oracle exercises BOTH the keep and the drop paths (without
    * the injection the corpus has no cross-boundary duplicates and a
    * screen that never drops anything would pass vacuously). The
    * md5(normalized) recipe is qdedup_exact's proven oracle
    * expression; the oracle anti-join is NOT EXISTS, not NOT IN —
    * NOT IN returns zero rows if the history ever contains a NULL
    * hash, where left_anti keeps the non-matches. */
  val qExactInc = Q(
    "qdedup_exact_inc",
    (s, dir) => {
      val t = Tables(s, dir)
      val d = t.documents.select(col("doc_id"), col("text"))
      val hist = d.filter(col("doc_id") <= 250)
      val inc = d.filter(col("doc_id") > 250)
        .unionByName(d.filter(col("doc_id") === 1)
          .select((col("doc_id") + 9000).as("doc_id"),
            concat(lit("  "), upper(col("text"))).as("text")))
        .unionByName(d.filter(col("doc_id") === 2)
          .select((col("doc_id") + 9000).as("doc_id"), col("text")))
      Dedup.exactDedupAgainstIndex(inc, col("text"),
          Dedup.contentHashIndex(hist, col("text")))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents),
      inc AS (SELECT doc_id, text FROM d WHERE doc_id > 250
              UNION ALL SELECT doc_id + 9000, '  ' || upper(text) FROM d WHERE doc_id = 1
              UNION ALL SELECT doc_id + 9000, text FROM d WHERE doc_id = 2),
      h AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
            FROM d WHERE doc_id <= 250)
      SELECT inc.doc_id FROM inc
      WHERE NOT EXISTS (SELECT 1 FROM h
        WHERE h.ch = md5(regexp_replace(lower(trim(inc.text)), '\s+', ' ', 'g')))
      ORDER BY inc.doc_id"""))

  /** Bloom-prefiltered incremental exact screen (C98): same semantics
    * as qdedup_exact_inc on a different history cut — the Bloom filter
    * is a pure shuffle-reduction prefilter, so the oracle is the plain
    * exact NOT-EXISTS screen, proving no false negative ever drops a
    * new row and no false positive survives the exact verify. Replays
    * of docs 5 (normalization-collapsed) and 6 (byte-exact) force both
    * drop paths through the bloom → exact-join route. */
  val qBloomInc = Q(
    "qdedup_bloom_inc",
    (s, dir) => {
      val t = Tables(s, dir)
      val d = t.documents.select(col("doc_id"), col("text"))
      val hist = d.filter(col("doc_id") <= 300)
      val inc = d.filter(col("doc_id") > 300)
        .unionByName(d.filter(col("doc_id") === 5)
          .select((col("doc_id") + 9000).as("doc_id"),
            concat(lit("  "), upper(col("text"))).as("text")))
        .unionByName(d.filter(col("doc_id") === 6)
          .select((col("doc_id") + 9000).as("doc_id"), col("text")))
      Dedup.bloomScreenAgainstIndex(inc, col("text"),
          Dedup.contentHashIndex(hist, col("text")),
          expectedItems = 1024, fpp = 0.03)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents),
      inc AS (SELECT doc_id, text FROM d WHERE doc_id > 300
              UNION ALL SELECT doc_id + 9000, '  ' || upper(text) FROM d WHERE doc_id = 5
              UNION ALL SELECT doc_id + 9000, text FROM d WHERE doc_id = 6),
      h AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
            FROM d WHERE doc_id <= 300)
      SELECT inc.doc_id FROM inc
      WHERE NOT EXISTS (SELECT 1 FROM h
        WHERE h.ch = md5(regexp_replace(lower(trim(inc.text)), '\s+', ' ', 'g')))
      ORDER BY inc.doc_id"""))

  /** Line-level cross-doc dedup (C47): the corpus has no newlines, so
    * each doc gets a deterministic multi-line tail — a line shared by
    * ALL docs (dropped), a doc-unique line (kept), a whitespace-only
    * line (kept by the structure rule), and a line shared by the even
    * half (dropped). The original text rides as line 0, so the
    * corpus's own exact-duplicate docs drop each other's text line —
    * the operator's real behavior, mirrored in the oracle. The engine
    * groups line frequency on xxhash64; the oracle groups on the line
    * string — semantic parity, the C22 hashed-key discipline. */
  val qLines = Q(
    "qdedup_lines",
    (s, dir) => {
      val id = col("doc_id")
      val injected = concat(col("text"),
        lit("\nShare this article\nUnique to doc "), id.cast("string"),
        lit("\n   "),
        when(id % 2 === 0, lit("\nSubscribe now")).otherwise(lit("")))
      Dedup.lineDupRemove(
          Tables(s, dir).documents.select(id, injected.as("t")),
          col("doc_id"), col("t"), minDocs = 2, minChars = 1)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH inj AS (
        SELECT doc_id,
          text || chr(10) || 'Share this article' || chr(10) || 'Unique to doc ' ||
          CAST(doc_id AS VARCHAR) || chr(10) || '   ' ||
          CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Subscribe now' ELSE '' END AS t
        FROM documents),
      ls AS (SELECT doc_id, t, string_split(t, chr(10)) AS arr FROM inj),
      l AS (SELECT doc_id, unnest(arr) AS line,
                   unnest(range(0, len(arr))) AS pos FROM ls),
      el AS (SELECT doc_id, line, pos FROM l WHERE length(trim(line)) >= 1),
      f AS (SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS nd
                              FROM el GROUP BY line) WHERE nd >= 2),
      dr AS (SELECT doc_id, pos FROM el JOIN f USING (line)),
      dl AS (SELECT doc_id, COUNT(*) AS nrem FROM dr GROUP BY doc_id),
      keep AS (SELECT l.doc_id, l.line, l.pos
               FROM l LEFT JOIN dr ON dr.doc_id = l.doc_id AND dr.pos = l.pos
               WHERE dr.pos IS NULL),
      o AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean
            FROM keep GROUP BY doc_id)
      SELECT i.doc_id,
        CASE WHEN COALESCE(dl.nrem, 0) = 0 THEN i.t
             ELSE COALESCE(o.clean, '') END AS clean,
        CAST(COALESCE(dl.nrem, 0) AS BIGINT) AS removed_lines
      FROM inj i
      LEFT JOIN o ON o.doc_id = i.doc_id
      LEFT JOIN dl ON dl.doc_id = i.doc_id
      ORDER BY i.doc_id"""))

  /** WITHIN-doc repeated-line removal (C50). The injection plants, in
    * every doc: a doc-unique line repeated twice (proves the match is
    * intra-doc — the text occurs in ONE doc only), a "Cookie notice"
    * line repeated for every third doc, and a whitespace-only line
    * twice (never dropped, never shadowing). The oracle mirrors the
    * first-occurrence scan as the same indexed list_filter fold. */
  val qLinesWd = Q(
    "qdedup_lines_wd",
    (s, dir) => {
      val id = col("doc_id")
      val injected = concat(col("text"),
        lit("\nUnique to doc "), id.cast("string"),
        lit("\n   \nCookie notice\nUnique to doc "), id.cast("string"),
        lit("\n   "),
        when(id % 3 === 0, lit("\nCookie notice")).otherwise(lit("")))
      Dedup.lineRepeatRemove(
          Tables(s, dir).documents.select(id, injected.as("t")),
          col("doc_id"), col("t"), minChars = 1)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH inj AS (
        SELECT doc_id,
          text || chr(10) || 'Unique to doc ' || CAST(doc_id AS VARCHAR) ||
          chr(10) || '   ' || chr(10) || 'Cookie notice' ||
          chr(10) || 'Unique to doc ' || CAST(doc_id AS VARCHAR) ||
          chr(10) || '   ' ||
          CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Cookie notice' ELSE '' END AS t
        FROM documents),
      s AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM inj),
      k AS (SELECT doc_id, t, ls,
              list_filter(ls, (x, i) -> length(trim(x)) < 1 OR
                len(list_filter(ls[1:i-1], y -> y = x)) = 0) AS kept
            FROM s)
      SELECT doc_id,
        CASE WHEN len(kept) = len(ls) THEN t
             ELSE array_to_string(kept, chr(10)) END AS clean,
        CAST(len(ls) - len(kept) AS BIGINT) AS removed_lines
      FROM k
      ORDER BY doc_id"""))

  /** URL dedup (C55) over a deterministic injected URL fixture: docs
    * pair up (4k with 4k+1, 4k+2 with 4k+3) under raw strings that
    * differ by casing, `www.`, default port, fragment, tracking
    * params, param ORDER and a trailing slash — every canonicalization
    * rule must fire for the pairs to collapse. Engine groups on
    * xxhash64(canonical); oracle groups on the canonical string itself
    * (the C22 hashed-key parity discipline) and mirrors the
    * rule chain term-for-term. */
  val qUrl = Q(
    "qdedup_url",
    (s, dir) => {
      val g = floor(col("doc_id") / 4).cast("long").cast("string")
      val url = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("HTTP://WWW.Example.COM:80/Path/"), g,
            lit("/page?utm_source=feed&id="), g, lit("&b=2#frag")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("http://example.com/Path/"), g, lit("/page?b=2&id="), g))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("https://Example.com:443/other/"), g, lit("/?gclid=xyz")))
        .otherwise(concat(lit("https://example.com/other/"), g))
      Dedup.urlDedup(
          Tables(s, dir).documents.select(col("doc_id"), url.as("url")),
          col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH urls AS (
        SELECT doc_id,
          CASE doc_id % 4
            WHEN 0 THEN 'HTTP://WWW.Example.COM:80/Path/' || g ||
                        '/page?utm_source=feed&id=' || g || '&b=2#frag'
            WHEN 1 THEN 'http://example.com/Path/' || g || '/page?b=2&id=' || g
            WHEN 2 THEN 'https://Example.com:443/other/' || g || '/?gclid=xyz'
            ELSE 'https://example.com/other/' || g END AS url
        FROM (SELECT doc_id,
                CAST(CAST(FLOOR(doc_id / 4.0) AS BIGINT) AS VARCHAR) AS g
              FROM documents)),
      p1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf FROM urls),
      p2 AS (SELECT doc_id, url, nf,
               lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(
                 lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                 '^www\.', '') AS h1,
               regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS pq
             FROM p1),
      p3 AS (SELECT doc_id, url, scheme, h1,
               CASE WHEN strpos(pq, '?') > 0 THEN substr(pq, 1, strpos(pq, '?') - 1)
                    ELSE pq END AS path,
               COALESCE(array_to_string(list_sort(list_filter(
                 string_split(CASE WHEN strpos(pq, '?') > 0
                                   THEN substr(pq, strpos(pq, '?') + 1)
                                   ELSE '' END, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)='))),
                 '&'), '') AS sq
             FROM p2),
      c AS (SELECT doc_id,
              CASE WHEN scheme = '' THEN url ELSE
                scheme || '://' ||
                (CASE WHEN scheme = 'http' THEN regexp_replace(h1, ':80$', '')
                      WHEN scheme = 'https' THEN regexp_replace(h1, ':443$', '')
                      ELSE h1 END) ||
                regexp_replace(path, '/+$', '') ||
                (CASE WHEN sq = '' THEN '' ELSE '?' || sq END)
              END AS canonical_url
            FROM p3),
      grp AS (SELECT canonical_url, MIN(doc_id) AS keep_id
              FROM c GROUP BY canonical_url)
      SELECT c.doc_id, c.canonical_url, c.doc_id = grp.keep_id AS keep
      FROM c JOIN grp USING (canonical_url)
      ORDER BY c.doc_id"""))

  // C71: winnowing fingerprint pairs (MOSS). The oracle mirrors the
  // whole pipeline — per-position FNV k-gram hashes on the shared
  // fnvSignedCtes byte/fold recipe, min-per-window selection (the
  // rightmost-tie rule affects positions only, never which HASH a
  // window selects, so the hash-set pair detection is tie-free),
  // distinct per doc, ubiquity cap, self-join. k=16/w=12 so shared
  // substrings of ≥ 27 normalized chars guarantee a shared
  // fingerprint; cap=8 evicts template grams in this heavily
  // templated synthetic corpus.
  val qWinnow = Q(
    "qdedup_winnow",
    (s, dir) => {
      val t = Tables(s, dir)
      Dedup.winnowPairs(t.documents, col("doc_id"), col("text"),
          k = 16, w = 12, minShared = 3, maxDocsPerFp = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
                 FROM documents WHERE text IS NOT NULL),
      dn AS (SELECT doc_id, t, length(t) - 15 AS cnt FROM d WHERE length(t) >= 16),
      by AS (SELECT doc_id, cnt,
              [ord(substring(t, i, 1)) FOR i IN range(1, length(t)+1)] AS bytes FROM dn),
      hs AS (SELECT doc_id, cnt,
              [CAST(CASE WHEN fh >= 9223372036854775808::HUGEINT
                    THEN fh - 18446744073709551616::HUGEINT ELSE fh END AS BIGINT)
               FOR fh IN [list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                               list_transform(list_slice(bytes, i, i + 15), x -> CAST(x AS HUGEINT))),
                  (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT)
                 FOR i IN range(1, cnt + 1)]] AS hv
             FROM by),
      fp AS (SELECT doc_id, unnest(list_distinct(
               [list_min(list_slice(hv, j, j + 11))
                FOR j IN range(1, greatest(cnt - 11, 1) + 1)])) AS fp_hash
             FROM hs),
      fpc AS (SELECT doc_id, fp_hash FROM fp
              WHERE fp_hash NOT IN (SELECT fp_hash FROM fp GROUP BY fp_hash HAVING COUNT(*) > 8))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fpc a JOIN fpc b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
      ORDER BY id_a, id_b"""))

  // C76: asymmetric containment (quote/subset detection). Engine
  // groups on xxhash64 of the shingle; oracle on the string — the C22
  // hashed-key parity discipline. Ratio rounded to 4 before the
  // threshold in BOTH engines.
  val qContainment = Q(
    "qdedup_containment",
    (s, dir) => {
      Dedup.containmentPairs(Tables(s, dir).documents,
          col("doc_id"), col("text"), n = 5, threshold = 0.5,
          maxDocsPerShingle = 20)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents WHERE text IS NOT NULL),
      shx AS (SELECT doc_id, unnest([array_to_string(w[i:i+4], ' ')
               FOR i IN range(1, greatest(len(w) - 4, 0) + 1)]) AS g FROM toks),
      sh AS (SELECT DISTINCT doc_id, g FROM shx),
      sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      capd AS (SELECT doc_id, g FROM sh
               WHERE g NOT IN (SELECT g FROM sh GROUP BY g HAVING COUNT(*) > 20)),
      pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
             FROM capd a JOIN capd b ON a.g = b.g AND a.doc_id <> b.doc_id
             GROUP BY 1, 2),
      ct AS (SELECT pr.id_a, pr.id_b, pr.n_shared,
               ROUND(CAST(pr.n_shared AS DOUBLE) / sz.n_sh, 4) AS containment
             FROM pr JOIN sz ON sz.doc_id = pr.id_a)
      SELECT id_a, id_b, n_shared, containment
      FROM ct WHERE containment >= 0.5
      ORDER BY id_a, id_b"""))

  // C87: edit-distance pairs over injected short titles — every
  // doc_id%4 residue is one edit off the group's base form (insert /
  // substitute / delete), so within-group pairs AND cross-group
  // numeral-typo pairs are all non-vacuous; the oracle is the brute
  // all-pairs levenshtein, so the deletion-neighborhood blocking's
  // losslessness is what the hash-match proves.
  val qEditDist = Q(
    "qdedup_editdist",
    (s, dir) => {
      val res = pmod(col("doc_id"), lit(4))
      val g = floor(col("doc_id") / 4).cast("long").cast("string")
      val title = when(res === 0, concat(lit("record number "), g))
        .when(res === 1, concat(lit("record number "), g, lit("s")))
        .when(res === 2, concat(lit("record numbex "), g))
        .otherwise(concat(lit("record numbe "), g))
      Dedup.editDistancePairs(
          Tables(s, dir).documents.select(col("doc_id"), title.as("t")),
          col("doc_id"), col("t"), maxDist = 1)
        .transform(Q.orderedDump(_, col("id_a"), col("id_b")))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          CASE doc_id % 4
            WHEN 0 THEN 'record number ' || g
            WHEN 1 THEN 'record number ' || g || 's'
            WHEN 2 THEN 'record numbex ' || g
            ELSE 'record numbe ' || g END AS t
        FROM (SELECT doc_id,
                CAST(CAST(FLOOR(doc_id / 4.0) AS BIGINT) AS VARCHAR) AS g
              FROM documents))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.t, b.t) AS INT) AS dist
      FROM t a JOIN t b ON a.doc_id < b.doc_id
      WHERE levenshtein(a.t, b.t) <= 1
      ORDER BY id_a, id_b"""))

  // C121: content-defined chunk dedup (LBFS cut rule, anchored max).
  // The oracle replays the whole chunking: per-position FNV window
  // hashes on the shared fold recipe, power-of-two residue cuts
  // (unsigned HUGEINT `% 64` ≡ the kernel's signed `& 63` — low bits
  // agree bit-for-bit), anchored 256-cuts, md5 per chunk substring.
  // w=8/div=64 → mean chunk ~64 chars on this ~300-char corpus, so
  // the duplicate report is non-vacuous (shared template spans align
  // to content cuts regardless of offset shift).
  val qCdc = Q(
    "qdedup_cdc_chunks",
    (s, dir) =>
      Dedup.cdcChunkDedup(Tables(s, dir).documents, col("doc_id"), col("text"),
          w = 8, div = 64, maxLen = 256)
        .orderBy(col("chunk_hash")),
    Some("""
      WITH d AS (SELECT doc_id, text AS t FROM documents
                 WHERE text IS NOT NULL AND length(text) > 0),
      by AS (SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n,
              [ord(substring(t, i, 1)) FOR i IN range(1, length(t)+1)] AS bytes
             FROM d),
      hs AS (SELECT doc_id, t, n,
              [CAST(i AS BIGINT) FOR i IN range(8, n + 1)
               IF list_reduce(
                    list_prepend(CAST(14695981039346656037 AS HUGEINT),
                                 list_transform(list_slice(bytes, i - 7, i), x -> CAST(x AS HUGEINT))),
                    (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT) % 64 = 0] AS ccuts
             FROM by),
      cts AS (SELECT doc_id,
               list_sort(list_distinct(
                 ccuts
                 || [CAST(k * 256 AS BIGINT) FOR k IN range(1, CAST((n - 1) // 256 AS BIGINT) + 1)]
                 || [n])) AS cuts
              FROM hs),
      ch AS (SELECT doc_id,
               unnest([{s: CASE WHEN j = 1 THEN 1 ELSE cuts[j-1] + 1 END, e: cuts[j]}
                       FOR j IN range(1, len(cuts) + 1)]) AS c
             FROM cts),
      h2 AS (SELECT ch.doc_id, c.s AS start, c.e - c.s + 1 AS len,
               md5(substring(d.t, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT))) AS chunk_hash
             FROM ch JOIN d USING (doc_id))
      SELECT chunk_hash, MAX(len) AS chunk_len,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM h2 GROUP BY chunk_hash HAVING COUNT(*) >= 2
      ORDER BY chunk_hash"""))

  // C121 pairs: same chunk machinery, winnowPairs discipline (distinct
  // per doc, ubiquity cap 20, >= 2 shared chunks).
  val qCdcPairs = Q(
    "qdedup_cdc_pairs",
    (s, dir) =>
      Dedup.cdcPairs(Tables(s, dir).documents, col("doc_id"), col("text"),
          w = 8, div = 64, maxLen = 256, minShared = 2, maxDocsPerChunk = 20)
        .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH d AS (SELECT doc_id, text AS t FROM documents
                 WHERE text IS NOT NULL AND length(text) > 0),
      by AS (SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n,
              [ord(substring(t, i, 1)) FOR i IN range(1, length(t)+1)] AS bytes
             FROM d),
      hs AS (SELECT doc_id, t, n,
              [CAST(i AS BIGINT) FOR i IN range(8, n + 1)
               IF list_reduce(
                    list_prepend(CAST(14695981039346656037 AS HUGEINT),
                                 list_transform(list_slice(bytes, i - 7, i), x -> CAST(x AS HUGEINT))),
                    (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT) % 64 = 0] AS ccuts
             FROM by),
      cts AS (SELECT doc_id,
               list_sort(list_distinct(
                 ccuts
                 || [CAST(k * 256 AS BIGINT) FOR k IN range(1, CAST((n - 1) // 256 AS BIGINT) + 1)]
                 || [n])) AS cuts
              FROM hs),
      ch AS (SELECT doc_id,
               unnest([{s: CASE WHEN j = 1 THEN 1 ELSE cuts[j-1] + 1 END, e: cuts[j]}
                       FOR j IN range(1, len(cuts) + 1)]) AS c
             FROM cts),
      h2 AS (SELECT ch.doc_id,
               md5(substring(d.t, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT))) AS chunk_hash
             FROM ch JOIN d USING (doc_id)),
      dc AS (SELECT DISTINCT doc_id, chunk_hash FROM h2),
      capd AS (SELECT doc_id, chunk_hash FROM dc
               WHERE chunk_hash NOT IN (SELECT chunk_hash FROM dc
                                        GROUP BY chunk_hash HAVING COUNT(*) > 20))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM capd a JOIN capd b ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY id_a, id_b"""))

  // C121 rewrite: one copy of every duplicated span survives
  // corpus-wide; the oracle replays the chunk chain, picks the same
  // (doc_id, start)-minimal keeper via a window rank, and reassembles
  // each doc as the ordered string_agg of its kept chunk substrings —
  // byte-exact against the engine's sorted-struct concat.
  val qCdcRm = Q(
    "qdedup_cdc_rm",
    (s, dir) =>
      Dedup.cdcDedupRewrite(Tables(s, dir).documents, col("doc_id"), col("text"),
          w = 8, div = 64, maxLen = 256)
        .orderBy(col("doc_id")),
    Some("""
      WITH d AS (SELECT doc_id, text AS t FROM documents
                 WHERE text IS NOT NULL AND length(text) > 0),
      by AS (SELECT doc_id, t, CAST(length(t) AS BIGINT) AS n,
              [ord(substring(t, i, 1)) FOR i IN range(1, length(t)+1)] AS bytes
             FROM d),
      hs AS (SELECT doc_id, t, n,
              [CAST(i AS BIGINT) FOR i IN range(8, n + 1)
               IF list_reduce(
                    list_prepend(CAST(14695981039346656037 AS HUGEINT),
                                 list_transform(list_slice(bytes, i - 7, i), x -> CAST(x AS HUGEINT))),
                    (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT) % 64 = 0] AS ccuts
             FROM by),
      cts AS (SELECT doc_id,
               list_sort(list_distinct(
                 ccuts
                 || [CAST(k * 256 AS BIGINT) FOR k IN range(1, CAST((n - 1) // 256 AS BIGINT) + 1)]
                 || [n])) AS cuts
              FROM hs),
      ch AS (SELECT doc_id,
               unnest([{s: CASE WHEN j = 1 THEN 1 ELSE cuts[j-1] + 1 END, e: cuts[j]}
                       FOR j IN range(1, len(cuts) + 1)]) AS c
             FROM cts),
      h2 AS (SELECT ch.doc_id, c.s AS start, c.e - c.s + 1 AS len,
               md5(substring(d.t, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT))) AS chunk_hash
             FROM ch JOIN d USING (doc_id)),
      kd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                          ORDER BY doc_id, start) = 1 AS keep
             FROM h2)
      SELECT kd.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             COALESCE(string_agg(CASE WHEN keep
               THEN substring(d.t, CAST(start AS INT), CAST(len AS INT)) END,
               '' ORDER BY start), '') AS new_text
      FROM kd JOIN d USING (doc_id)
      GROUP BY kd.doc_id
      ORDER BY kd.doc_id"""))

  val all: Seq[Q] = Seq(qExact, qNgram, qNgramCollapsed, qMinhash, qMinhashCollapsed,
    qSimhash, qSourceMatrix,
    qEmbedding, qEmbeddingLsh, qEmbeddingCollapsed, qEmbeddingLshCollapsed,
    qSemantic, qIncremental, qPassage, qPassageRm, qExactInc, qBloomInc, qLines,
    qLinesWd, qUrl, qWinnow, qContainment, qEditDist, qCdc, qCdcPairs, qCdcRm)
}
