package graft.functions

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed text-analysis queries over `documents`
  * (SURVEY.md §2.C8-C11). */
object TextQueries {

  val qTokens = Q(
    "qtext_tokens",
    (s, dir) => {
      Tables(s, dir).documents.select(
          col("doc_id"),
          TextFunctions.tokenCountWs(col("text")).cast("long").as("ws_tokens"),
          TextFunctions.tokenCountBpe(col("text")).cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CAST(length(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
      FROM documents
      ORDER BY doc_id"""))

  private[graft] def langHitsSql(pat: String) =
    s"CAST(length(regexp_extract_all(lower(text), '\\b$pat\\b')) AS BIGINT)"

  val qLangid = Q(
    "qtext_langid",
    (s, dir) => {
      val t = col("text")
      Tables(s, dir).documents.select(
          col("doc_id"),
          TextFunctions.stopwordHits(t, "en").cast("long").as("en_hits"),
          TextFunctions.stopwordHits(t, "de").cast("long").as("de_hits"),
          TextFunctions.stopwordHits(t, "es").cast("long").as("es_hits"),
          TextFunctions.stopwordHits(t, "fr").cast("long").as("fr_hits"),
          TextFunctions.cjkHits(t).cast("long").as("zh_hits"),
          TextFunctions.langId(t).as("predicted"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH h AS (
        SELECT doc_id,
          ${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("en"))} AS en_hits,
          ${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("de"))} AS de_hits,
          ${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("es"))} AS es_hits,
          ${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("fr"))} AS fr_hits,
          CAST(length(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS zh_hits
        FROM documents)
      SELECT doc_id, en_hits, de_hits, es_hits, fr_hits, zh_hits,
        CASE WHEN en_hits = GREATEST(en_hits, de_hits, es_hits, fr_hits, zh_hits) THEN 'en'
             WHEN de_hits = GREATEST(en_hits, de_hits, es_hits, fr_hits, zh_hits) THEN 'de'
             WHEN es_hits = GREATEST(en_hits, de_hits, es_hits, fr_hits, zh_hits) THEN 'es'
             WHEN fr_hits = GREATEST(en_hits, de_hits, es_hits, fr_hits, zh_hits) THEN 'fr'
             ELSE 'zh' END AS predicted
      FROM h
      ORDER BY doc_id"""))

  val qQuality = Q(
    "qtext_quality",
    (s, dir) => {
      val t = col("text")
      Tables(s, dir).documents.select(
          col("doc_id"),
          TextFunctions.tokenCountWs(t).cast("long").as("n_tokens"),
          round(TextFunctions.distinctTokenRatio(t), 4).as("distinct_ratio"),
          round(TextFunctions.meanTokenLength(t), 4).as("mean_token_len"),
          round(TextFunctions.stopwordRatio(t), 4).as("stopword_ratio"),
          TextFunctions.qualityScore(t).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id,
          CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / length(string_split(text, ' ')) AS dr,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / length(string_split(text, ' ')) AS mtl,
          CAST(${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("en"))} AS DOUBLE)
            / length(string_split(text, ' ')) AS sr
        FROM documents)
      SELECT doc_id, n_tokens,
        ROUND(dr, 4) AS distinct_ratio,
        ROUND(mtl, 4) AS mean_token_len,
        ROUND(sr, 4) AS stopword_ratio,
        ROUND(0.4 * dr + 0.3 * LEAST(mtl / 8.0, 1.0) + 0.3 * LEAST(sr * 5.0, 1.0), 4) AS quality
      FROM m
      ORDER BY doc_id"""))

  /** Per-source quantile calibration of the quality score (C117): the
    * proven qtext_quality formulation micro-scaled, then the exact
    * within-source ECDF and a τ = 0.70 percentile gate. The oracle
    * states the DEFINITION (`RANK() − 1` = strictly-smaller count in
    * one per-source window) while the operator computes it under the
    * scale-bounded two-pass value-count discipline — a mismatch
    * isolates the prefix-sum arithmetic. */
  val qCalibrate = Q(
    "qtext_calibrate",
    (s, dir) => {
      val scored = Tables(s, dir).documents.select(
        col("doc_id"), col("source"),
        round(TextFunctions.qualityScore(col("text")) * lit(1e6)).cast("long")
          .as("sm"))
      graft.operators.Curation.calibrateBySource(scored, col("doc_id"),
          col("source"), col("sm"), tauMicro = 700000L)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id, source,
          CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / length(string_split(text, ' ')) AS dr,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / length(string_split(text, ' ')) AS mtl,
          CAST(${langHitsSql(TextFunctions.StopwordProfiles.toMap.apply("en"))} AS DOUBLE)
            / length(string_split(text, ' ')) AS sr
        FROM documents),
      sc AS (SELECT doc_id, source,
               CAST(ROUND(1e6 * ROUND(0.4 * dr + 0.3 * LEAST(mtl / 8.0, 1.0)
                 + 0.3 * LEAST(sr * 5.0, 1.0), 4)) AS BIGINT) AS score_micro
             FROM m),
      s AS (SELECT * FROM sc WHERE score_micro IS NOT NULL),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM s GROUP BY source),
      r AS (SELECT doc_id, source, score_micro,
              CAST(RANK() OVER (PARTITION BY source ORDER BY score_micro) - 1
                AS BIGINT) AS below
            FROM s)
      SELECT r.doc_id, r.source, r.score_micro,
             (1000000 * below) // n_src AS pct_micro,
             (1000000 * below) // n_src >= 700000 AS kept
      FROM r JOIN n USING (source)
      ORDER BY r.doc_id"""))

  // Custom-Expression fingerprint WITH a full-parity oracle: FNV-1a is
  // not a DuckDB built-in, but it IS expressible as a list_reduce over
  // character codes with HUGEINT modular arithmetic (h = (h XOR b) *
  // 0x100000001b3 mod 2^64, init 0xcbf29ce484222325), matching the
  // published test vectors exactly. ord(char) == UTF-8 byte only for
  // ASCII — verified true for the documents corpus at every SF; the
  // spec-pinned vectors in DedupSpec remain the codepoint-independent
  // ground truth.
  val qFingerprint = Q(
    "qtext_fingerprint",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      Tables(s, dir).documents.select(
          col("doc_id"),
          call_function("fnv1a64", TextFunctions.normalizeText(col("text"))).as("fingerprint"))
        .orderBy(col("doc_id"))
    },
    Some {
      val normKey = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
      s"""
      WITH ${graft.Q.sqlutil.fnvSignedCtes("", normKey, Seq("doc_id"), "documents")}
      SELECT doc_id, sb AS fingerprint
      FROM g
      ORDER BY doc_id"""
    })

  /** Top-5 tf-idf keywords per doc. Membership/order is decided by the
    * integer-exact (tf desc, df asc, term asc) key — see [[Keywords]]
    * for why the float score must not decide the top-k boundary. */
  val qTfIdf = Q(
    "qtext_tfidf",
    (s, dir) => {
      Keywords.tfIdfTopK(Tables(s, dir).documents, col("doc_id"), col("text"), k = 5)
        .orderBy(col("doc_id"), col("kw_rank"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      t AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term <> '' GROUP BY doc_id, term),
      d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      r AS (SELECT t.doc_id, t.term, t.tf, d.df,
              ROUND(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 4) AS tfidf,
              row_number() OVER (PARTITION BY t.doc_id
                                 ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS kw_rank
            FROM t JOIN d USING (term) CROSS JOIN n)
      SELECT doc_id, CAST(kw_rank AS BIGINT) AS kw_rank, term, tf, df, tfidf
      FROM r WHERE kw_rank <= 5
      ORDER BY doc_id, kw_rank"""))

  /** PII/URL scrub (C21). The corpus carries no real PII, so the query
    * injects a deterministic email + URL (with an email-shaped query
    * param) + phone built from doc_id into every row — each row then
    * exercises all three redaction classes AND the order contract (the
    * second email lives inside the URL and must vanish as part of it,
    * not as an <EMAIL>). Staged counts are measured on the
    * before-frame of each stage, oracle-identically. */
  val qScrub = Q(
    "qtext_scrub",
    (s, dir) => {
      val id = col("doc_id").cast("string")
      val injected = concat(col("text"),
        lit(" Contact user"), id, lit("@example.com or https://ex.io/d/"), id,
        lit("?ref=user"), id, lit("@example.com call +1 (555) 123-4567 now"))
      val t1 = TextFunctions.redactUrls(injected)
      val t2 = TextFunctions.redactEmails(t1)
      Tables(s, dir).documents.select(
          col("doc_id"),
          regexp_count(injected, lit(TextFunctions.UrlPattern)).cast("long").as("n_urls"),
          regexp_count(t1, lit(TextFunctions.EmailPattern)).cast("long").as("n_emails"),
          regexp_count(t2, lit(TextFunctions.PhonePattern)).cast("long").as("n_phones"),
          TextFunctions.redactPhones(t2).as("clean"))
        .orderBy(col("doc_id"))
    },
    Some {
      // byte-identical regexes: the patterns avoid lookaround and \s,
      // so Java and RE2 read them the same (see TextFunctions)
      val (u, e, p) =
        (TextFunctions.UrlPattern, TextFunctions.EmailPattern, TextFunctions.PhonePattern)
      s"""
      WITH inj AS (
        SELECT doc_id, text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
          '@example.com or https://ex.io/d/' || CAST(doc_id AS VARCHAR) ||
          '?ref=user' || CAST(doc_id AS VARCHAR) ||
          '@example.com call +1 (555) 123-4567 now' AS t
        FROM documents),
      s1 AS (SELECT doc_id, t, regexp_replace(t, '$u', '<URL>', 'g') AS t1 FROM inj),
      s2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '$e', '<EMAIL>', 'g') AS t2 FROM s1)
      SELECT doc_id,
        CAST(length(regexp_extract_all(t, '$u')) AS BIGINT) AS n_urls,
        CAST(length(regexp_extract_all(t1, '$e')) AS BIGINT) AS n_emails,
        CAST(length(regexp_extract_all(t2, '$p')) AS BIGINT) AS n_phones,
        regexp_replace(t2, '$p', '<PHONE>', 'g') AS clean
      FROM s2
      ORDER BY doc_id"""
    })

  /** Repetition metric (C24): top word-bigram character fraction. */
  val qRepetition = Q(
    "qtext_repetition",
    (s, dir) => {
      Keywords.topNgramStats(Tables(s, dir).documents, col("doc_id"), col("text"), n = 2)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2),
      c AS (SELECT doc_id, gram, COUNT(*) AS cnt
            FROM grams GROUP BY doc_id, gram),
      r AS (SELECT doc_id, gram, cnt,
              row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
            FROM c),
      j AS (SELECT r.doc_id, r.gram, r.cnt, d.text,
              length(d.text) - length(replace(d.text, r.gram, '')) AS covered
            FROM r JOIN documents d ON d.doc_id = r.doc_id
            WHERE r.rn = 1)
      SELECT doc_id, gram AS top_gram,
        CAST(cnt AS BIGINT) AS n_occurrences,
        CAST(covered AS BIGINT) AS covered_chars,
        CAST(length(text) AS BIGINT) AS text_chars,
        ROUND(CAST(covered AS DOUBLE) / length(text), 4) AS top_gram_char_frac
      FROM j
      ORDER BY doc_id"""))

  /** THE single SQL definition of the Gopher rule measures (the `m`
    * CTE), the per-rule predicates, and the pass conjunction — shared
    * by qtext_gopher and the composed preprocessing pipeline so the
    * oracles can never drift, and derived from the same
    * [[TextFunctions.StopwordWords]] word list the Spark side uses.
    * Thresholds here mirror the registered gopherGate(50, 100000, 4,
    * 10, 1) call sites. */
  private[graft] val GopherMCte: String = {
    val stops = TextFunctions.StopwordWords.toMap.apply("en")
      .map(w => s"'$w'").mkString(", ")
    s"""m AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
          CAST(len(list_filter(string_split(text, ' '),
                   t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_tokens,
          CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                   [$stops])) AS BIGINT) AS n_stop_distinct
        FROM documents)"""
  }
  /** One SQL predicate per rule over the m-CTE columns; the flag
    * columns AND the conjunction are built from these, never copied. */
  private[graft] val GopherRuleSql: Seq[(String, String)] = Seq(
    "ok_word_count" -> "(n_tokens >= 50 AND n_tokens <= 100000)",
    "ok_mean_len" -> "(n_chars >= 4 * n_tokens AND n_chars <= 10 * n_tokens)",
    "ok_alpha" -> "(5 * n_alpha_tokens >= 4 * n_tokens)",
    "ok_stopwords" -> "(n_stop_distinct >= 1)")
  private[graft] val GopherPassSql: String =
    GopherRuleSql.map(_._2).mkString("(", "\n          AND ", ")")

  /** Gopher-style rule gate (C25): each structural rule surfaced as its
    * own flag plus the conjunction. All cuts are integer comparisons
    * (see [[TextFunctions.gopherRules]]) so the pass/fail boundary is
    * exact in both engines. */
  val qGopher = Q(
    "qtext_gopher",
    (s, dir) => {
      // minStopwords = 1: the synthetic corpus vocabulary contains a
      // single profile stopword, so the published minimum of 2 would
      // fail every row and the conjunction would gate nothing
      TextFunctions.gopherGate(
          Tables(s, dir).documents.select(col("doc_id"), col("text")),
          col("text"),
          minTokens = 50, maxTokens = 100000, minMeanLen = 4, maxMeanLen = 10,
          minStopwords = 1)
        .drop("text", "n_chars")
        .orderBy(col("doc_id"))
    },
    Some {
      val flagCols = GopherRuleSql
        .map { case (n, p) => s"$p AS $n" }.mkString(",\n        ")
      val conj = GopherRuleSql.map(_._1).mkString("(", " AND ", ")")
      s"""
      WITH $GopherMCte,
      flags AS (
        SELECT doc_id, n_tokens, n_alpha_tokens, n_stop_distinct,
        $flagCols
        FROM m)
      SELECT doc_id, n_tokens, n_alpha_tokens, n_stop_distinct,
        ok_word_count, ok_mean_len, ok_alpha, ok_stopwords,
        $conj AS passes
      FROM flags
      ORDER BY doc_id"""
    })

  /** Corpus vocabulary head (C26): global term frequency + document
    * frequency for the top-50 terms, with each term's share of all
    * tokens. Scale shape: one explode → one map-side-combined
    * groupBy(term) (high-cardinality key), then the global top-k runs
    * as a map-side Partial WindowGroupLimit (≤50 rows per input
    * partition reach the final sort); the corpus token total rides
    * along as a broadcast 1-row aggregate. */
  val qVocab = Q(
    "qtext_vocab",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val terms = toks.groupBy(col("term"))
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      // total tokens = a straight count of the exploded frame — NOT
      // sum(tf) over `terms`, which would re-run the whole term-keyed
      // aggregation (a second explode + shuffle) just to add it back up
      val total = toks.agg(count(lit(1)).as("total"))
      terms
        .withColumn("vocab_rank",
          row_number().over(Window.orderBy(col("tf").desc, col("term"))).cast("long"))
        .filter(col("vocab_rank") <= 50)
        .crossJoin(broadcast(total))
        .select(col("vocab_rank"), col("term"), col("tf"), col("df"),
          round(col("tf").cast("double") / col("total"), 6).as("corpus_frac"))
        .orderBy(col("vocab_rank"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM toks WHERE term <> '' GROUP BY term),
      n AS (SELECT SUM(tf) AS total FROM t),
      r AS (SELECT term, tf, df,
              CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS BIGINT) AS vocab_rank
            FROM t)
      SELECT vocab_rank, term, tf, df,
        ROUND(CAST(tf AS DOUBLE) / total, 6) AS corpus_frac
      FROM r CROSS JOIN n
      WHERE vocab_rank <= 50
      ORDER BY vocab_rank"""))

  /** Cross-document boilerplate detector (C28): word-5-grams appearing
    * in ≥2 distinct documents, ranked by spread — the shared-span
    * signal behind template/boilerplate removal and the corpus-level
    * twin of per-doc repetition (C24). Scale shape: gram explode → one
    * (doc, gram) partial-agg shuffle → one gram-keyed agg (both
    * high-cardinality keys), and the global top-100 plans as a
    * map-side partial top-k exactly like qtext_vocab. The rank order
    * (doc_count desc, n_occurrences desc, gram asc) is all-integer, so
    * the top-k boundary is exact in both engines. */
  /** The ranked-boilerplate core both C28 queries share: (boiler_rank,
    * gram, doc_count, n_occurrences) for word-5-grams in ≥2 docs,
    * top-100 by the all-integer key. */
  private def boilerplateRanked(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("doc_id"),
        explode(graft.operators.Dedup.wordShingles(col("text"), n = 5, distinct = false))
          .as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_count"), sum(col("cnt")).as("n_occurrences"))
      .filter(col("doc_count") >= 2)
      .withColumn("boiler_rank", row_number().over(
        Window.orderBy(col("doc_count").desc, col("n_occurrences").desc, col("gram")))
        .cast("long"))
      .filter(col("boiler_rank") <= 100)
  }

  /** Same sharing on the SQL side: CTEs ending in `r` (ranked grams). */
  private val BoilerplateRankedCtes: String = """
      toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT doc_id,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 5 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 4)) AS u(i)
        WHERE len(t) >= 5),
      a AS (SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_count,
              CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM grams GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= 2),
      r AS (SELECT gram, doc_count, n_occurrences,
              CAST(ROW_NUMBER() OVER (ORDER BY doc_count DESC, n_occurrences DESC, gram)
                AS BIGINT) AS boiler_rank
            FROM a)"""

  val qBoilerplate = Q(
    "qtext_boilerplate",
    (s, dir) => {
      boilerplateRanked(Tables(s, dir).documents)
        .select(col("boiler_rank"), col("gram"), col("doc_count"), col("n_occurrences"))
        .orderBy(col("boiler_rank"))
    },
    Some(s"""
      WITH $BoilerplateRankedCtes
      SELECT boiler_rank, gram, doc_count, n_occurrences
      FROM r WHERE boiler_rank <= 100
      ORDER BY boiler_rank"""))

  /** Boilerplate REMOVAL (C28b) — the end-cap of the detect→remove
    * story: delete every occurrence of the flagged top-100 grams from
    * every document. The gram list is a 1-row collected array
    * (bounded: top-k), broadcast to the corpus, and the deletion is a
    * declarative `aggregate` fold of literal `replace` in rank order —
    * both engines fold the SAME list in the SAME order, so the oracle
    * checks the rewrite byte-for-byte. A replaced span leaves one
    * space (replace-with-" "), so removed_chars = len(text) −
    * len(clean) measures the surgery. Pure map over the corpus after
    * one bounded broadcast — no per-gram passes over storage. */
  val qBoilerplateRm = Q(
    "qtext_boilerplate_rm",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val gramList = boilerplateRanked(docs)
        .agg(transform(
          array_sort(collect_list(struct(col("boiler_rank"), col("gram")))),
          s => s.getField("gram")).as("grams"))
      docs.crossJoin(broadcast(gramList))
        .select(col("doc_id"), col("text"),
          aggregate(col("grams"), col("text"),
            (acc, g) => replace(acc, g, lit(" "))).as("clean"))
        .select(col("doc_id"), col("clean"),
          (length(col("text")) - length(col("clean"))).cast("long").as("removed_chars"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $BoilerplateRankedCtes,
      gl AS (SELECT list(gram ORDER BY boiler_rank) AS grams
             FROM r WHERE boiler_rank <= 100),
      c AS (SELECT d.doc_id, d.text,
              list_reduce(list_prepend(d.text, COALESCE(gl.grams, [])),
                (acc, g) -> replace(acc, g, ' ')) AS clean
            FROM documents d CROSS JOIN gl)
      SELECT doc_id, clean,
        CAST(length(text) - length(clean) AS BIGINT) AS removed_chars
      FROM c
      ORDER BY doc_id"""))

  /** Unigram LM scoring (C37): mean token log-prob per doc under the
    * corpus's own unigram model, fixed-point micro-nats (see
    * [[graft.functions.Keywords.unigramLogProb]]) so both engines sum
    * exact integers and `ln`'s libm dependence is confined to one
    * per-term rounding. */
  val qUnigramLp = Q(
    "qtext_unigram_lp",
    (s, dir) =>
      graft.functions.Keywords.unigramLogProb(
          Tables(s, dir).documents, col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      pd AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM toks WHERE term <> '' GROUP BY doc_id, term),
      v AS (SELECT term, SUM(cnt) AS tf FROM pd GROUP BY term),
      n AS (SELECT SUM(tf) AS total FROM v),
      lp AS (SELECT term,
               CAST(ROUND(ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000)
                    AS BIGINT) AS lp_micro
             FROM v CROSS JOIN n),
      sc AS (SELECT pd.doc_id, SUM(pd.cnt * lp.lp_micro) AS lp_sum,
               SUM(pd.cnt) AS n_toks
             FROM pd JOIN lp USING (term) GROUP BY pd.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_toks, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(sc.lp_sum, 0) AS BIGINT) AS lp_micro_sum,
        CASE WHEN sc.n_toks IS NULL THEN NULL
             ELSE ROUND(CAST(sc.lp_sum AS DOUBLE) / sc.n_toks / 1000000, 4)
        END AS mean_logprob
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** Bigram-LM conditional log-prob (C52). Engine keys the joins on
    * xxhash64 of the pair/context strings (8-byte shuffles); the
    * oracle keys on the strings themselves — identical counts unless
    * a 64-bit collision lands inside one vocab (~1e-11). Same
    * single-rounding micro-nat discipline the green unigram oracle
    * proves. */
  val qBigramLp = Q(
    "qtext_bigram_lp",
    (s, dir) =>
      graft.functions.Keywords.bigramLogProb(
          Tables(s, dir).documents, col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
                 FROM documents),
      bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg, w[i] AS w1
             FROM t, UNNEST(range(1, len(w))) AS u(i)),
      pd AS (SELECT doc_id, bg, w1, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM bg GROUP BY doc_id, bg, w1),
      v AS (SELECT bg, w1, SUM(cnt) AS c12 FROM pd GROUP BY bg, w1),
      cx AS (SELECT w1, SUM(c12) AS c1 FROM v GROUP BY w1),
      lp AS (SELECT bg,
               CAST(ROUND(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1000000)
                    AS BIGINT) AS lp_micro
             FROM v JOIN cx USING (w1)),
      sc AS (SELECT pd.doc_id, SUM(pd.cnt * lp.lp_micro) AS lp_sum,
               SUM(pd.cnt) AS n_bg
             FROM pd JOIN lp USING (bg) GROUP BY pd.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_bg, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(sc.lp_sum, 0) AS BIGINT) AS lp_micro_sum,
        CASE WHEN sc.n_bg IS NULL THEN NULL
             ELSE ROUND(CAST(sc.lp_sum AS DOUBLE) / sc.n_bg / 1000000, 4)
        END AS mean_logprob
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** Character entropy (C56). The oracle unnests positions (the
    * qpack lateral-range idiom) instead of splitting — same `(doc,
    * char)` counted frame — and mirrors the single-rounding micro-nat
    * term exactly; sums of longs then agree in any order. */
  val qEntropy = Q(
    "qtext_entropy",
    (s, dir) =>
      graft.functions.TextFunctions.charEntropy(
          Tables(s, dir).documents, col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      ch AS (SELECT doc_id, n, substr(text, CAST(i AS INT), 1) AS ch
             FROM d, UNNEST(range(1, n + 1)) u(i)),
      cnt AS (SELECT doc_id, n, ch, CAST(COUNT(*) AS BIGINT) AS c
              FROM ch GROUP BY doc_id, n, ch),
      t AS (SELECT doc_id,
              CAST(ROUND(CAST(c AS DOUBLE) / n * ln(CAST(c AS DOUBLE) / n)
                         * -1000000) AS BIGINT) AS tm
            FROM cnt),
      sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS distinct_chars,
               SUM(tm) AS hm
             FROM t GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
        COALESCE(sc.distinct_chars, 0) AS distinct_chars,
        CAST(COALESCE(sc.hm, 0) AS BIGINT) AS entropy_micro_sum,
        CASE WHEN sc.hm IS NULL THEN NULL
             ELSE CAST(sc.hm AS DOUBLE) / 1000000 END AS entropy_nats
      FROM d LEFT JOIN sc USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Encoding artifacts (C60). The corpus is clean ASCII, so the query
    * injects the three artifact classes deterministically by doc-id
    * residue (mojibake pair + triple + replacement char / C1 control /
    * untouched) — every rule must fire for its residue class and stay
    * silent elsewhere, so the oracle is non-vacuous in both directions.
    * The regex classes are THE SAME string constants on both sides
    * (`\x{...}` parses identically in Java regex and RE2). */
  val qMojibake = Q(
    "qtext_mojibake",
    (s, dir) => {
      val id = col("doc_id")
      val injected = concat(col("text"),
        when(id % 3 === 0, lit(" caf\u00C3\u00A9 don\u00E2\u20AC\u2122t \uFFFD"))
          .when(id % 3 === 1, lit(" x\u0085y"))
          .otherwise(lit("")))
      graft.functions.TextFunctions.encodingArtifacts(
          Tables(s, dir).documents.select(id, injected.as("t")),
          col("doc_id"), col("t"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH inj AS (
        SELECT doc_id,
          text || CASE
            WHEN doc_id % 3 = 0 THEN ' caf' || chr(195) || chr(169) ||
              ' don' || chr(226) || chr(8364) || chr(8482) || 't ' || chr(65533)
            WHEN doc_id % 3 = 1 THEN ' x' || chr(133) || 'y'
            ELSE '' END AS t
        FROM documents),
      c AS (SELECT doc_id,
              CAST(length(t) - length(regexp_replace(t,
                '${graft.functions.TextFunctions.ReplChar}', '', 'g')) AS BIGINT)
                AS n_repl,
              CAST(length(t) - length(regexp_replace(t,
                '${graft.functions.TextFunctions.CtrlChar}', '', 'g')) AS BIGINT)
                AS n_ctrl,
              CAST((length(t) - length(regexp_replace(t,
                  '${graft.functions.TextFunctions.MojiPair}', '', 'g'))) / 2
                + (length(t) - length(regexp_replace(t,
                  '${graft.functions.TextFunctions.MojiTriple}', '', 'g'))) / 3
                AS BIGINT) AS n_moji
            FROM inj)
      SELECT doc_id, n_repl, n_ctrl, n_moji,
        n_repl + n_ctrl + n_moji = 0 AS is_clean
      FROM c ORDER BY doc_id"""))

  /** HTML extraction (C45) under a byte-exact oracle: wrap each doc's
    * text in a deterministic HTML shell (head/style block, per-doc
    * heading, attributed tags, a script with a bare `<`, entity-coded
    * tail) and require the extraction to recover exactly
    * `Doc {id} {text} Tom & co <3` — both engines fold the SAME
    * pattern chain in the SAME order. */
  val qHtml = Q(
    "qtext_html",
    (s, dir) => {
      val id = col("doc_id").cast("string")
      val injected = concat(
        lit("<html><head><style>p{color:red}</style></head><body><h1>Doc "), id,
        lit("</h1><p class=\"main\">"), col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 < 2;</script>" +
          "Tom &amp; co &lt;3</body></html>"))
      // let-bind the extraction: the 9-operator regex/replace chain
      // must run once per row, not once for clean and again for the
      // removed_chars length (codegen CSE does not cover these trees)
      val cleanAndRemoved = graft.functions.Cols.let(
        TextFunctions.htmlToText(injected)) { c =>
        struct(c.as("clean"),
          (length(injected) - length(c)).cast("long").as("removed_chars"))
      }
      Tables(s, dir).documents.select(
          col("doc_id"), cleanAndRemoved.as("cr"))
        .select(col("doc_id"), col("cr.clean").as("clean"),
          col("cr.removed_chars").as("removed_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH inj AS (
        SELECT doc_id,
          '<html><head><style>p{color:red}</style></head><body><h1>Doc ' ||
          CAST(doc_id AS VARCHAR) || '</h1><p class="main">' || text ||
          '</p><script type="text/javascript">var x = 1 < 2;</script>' ||
          'Tom &amp; co &lt;3</body></html>' AS t
        FROM documents),
      c AS (SELECT doc_id, t,
              trim(regexp_replace(
                replace(replace(replace(replace(replace(replace(
                  regexp_replace(
                    regexp_replace(t, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                    '</?[a-zA-Z!][^>]*>', ' ', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                '[ \t\r\n]+', ' ', 'g')) AS clean
            FROM inj)
      SELECT doc_id, clean,
        CAST(length(t) - length(clean) AS BIGINT) AS removed_chars
      FROM c ORDER BY doc_id"""))

  /** Unicode NFC canonicalization (C46) under a byte-exact oracle: the
    * corpus is ASCII, so each doc gets a deterministic non-ASCII tail —
    * even doc_ids the DECOMPOSED spelling (`e` + combining acute
    * U+0301), odd the COMPOSED one (é U+00E9). NFC maps both to the
    * composed form, so the normalized text is identical across the
    * parity split (visible as n_chars_nfc < n_chars_raw exactly on
    * even rows) and the oracle compares the normalized STRING itself —
    * Java's Normalizer and DuckDB's nfc_normalize both implement
    * Unicode canonical composition, verified codepoint-identical on
    * the composition/ligature/partial-composition edge cases in
    * NfcSpec. (No post-NFC fingerprint here: the DuckDB FNV recipe is
    * ASCII-only — see qtext_fingerprint — and the normalized tail is
    * deliberately not.) */
  val qNfc = Q(
    "qtext_normalize",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val id = col("doc_id")
      val raw = concat(col("text"),
        when(id % 2 === 0, lit(" cafe\u0301 re\u0301sume\u0301"))
          .otherwise(lit(" caf\u00e9 r\u00e9sum\u00e9")))
      val norm = TextFunctions.nfcNormalize(raw)
      Tables(s, dir).documents.select(
          id,
          length(raw).cast("long").as("n_chars_raw"),
          length(norm).cast("long").as("n_chars_nfc"),
          norm.as("norm_text"))
        .orderBy(id)
    },
    Some("""
      WITH inj AS (
        SELECT doc_id,
          text || CASE WHEN doc_id % 2 = 0
            THEN ' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)
            ELSE ' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233) END AS raw
        FROM documents)
      SELECT doc_id,
        CAST(length(raw) AS BIGINT) AS n_chars_raw,
        CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_nfc,
        nfc_normalize(raw) AS norm_text
      FROM inj
      ORDER BY doc_id"""))

  /** Per-domain URL stats (C35) — the blocklist planning view. The
    * corpus carries no URLs, so the query injects two per row (doc-id-
    * keyed domain spread + one shared mixed-case host to pin the
    * lowercasing) — same injection idiom as qtext_scrub, oracle-
    * identical. */
  val qDomains = Q(
    "qtext_domains",
    (s, dir) => {
      val id = col("doc_id")
      val injected = concat(col("text"),
        lit(" see https://site"), (id % 7).cast("string"),
        lit(".example.com/p/"), id.cast("string"),
        lit(" and https://CDN.Example.net/x?u="), id.cast("string"))
      TextFunctions.domainStats(
          Tables(s, dir).documents.select(id, injected.as("t")),
          col("doc_id"), col("t"))
        .orderBy(col("domain"))
    },
    Some {
      val h = TextFunctions.UrlHostPattern
      s"""
      WITH inj AS (
        SELECT doc_id, text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR) ||
          '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
          ' and https://CDN.Example.net/x?u=' || CAST(doc_id AS VARCHAR) AS t
        FROM documents),
      d AS (SELECT doc_id,
              lower(UNNEST(regexp_extract_all(t, '$h', 1))) AS domain
            FROM inj)
      SELECT domain,
        CAST(COUNT(*) AS BIGINT) AS n_urls,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM d GROUP BY domain
      ORDER BY domain"""
    })

  /** Demo weight table for the hashed linear classifier: every bucket
    * carries a deterministic fixed-point weight in [-1000, 1000]
    * micro-unit-scaled by a Knuth-multiplier formula — standing in for
    * an offline-trained model. The ENGINE path treats it as an opaque
    * Map (the mechanism under test: literal-map lookup + integer fold);
    * only the ORACLE exploits the generating formula to reproduce the
    * values arithmetically. */
  private[graft] val demoWeights: Map[Long, Long] =
    (0L until 512L).map(b => b -> ((b * 2654435761L) % 2001L - 1000L)).toMap

  /** Hashing-trick linear classifier inference (C49): exact integer
    * score per doc plus the keep decision at threshold 0 (sigmoid is
    * monotone, so a linear-score threshold IS the probability
    * threshold). Oracle mirrors token split, FNV bucket (signed→pmod)
    * and the weight formula term-for-term; zero-token docs score
    * `bias` via the LEFT JOIN, matching the engine's empty-array
    * fold. */
  val qClassifier = Q(
    "qtext_classifier",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      Tables(s, dir).documents.select(
          col("doc_id"),
          TextFunctions.hashedLinearScore(col("text"), demoWeights,
            nBuckets = 512L).as("score"))
        .withColumn("keep", col("score") >= 0L)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, u.t AS t
                    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
                    WHERE u.t <> ''),
      ${graft.Q.sqlutil.fnvSignedCtes("", "t", Seq("doc_id"), "toks")},
      w AS (SELECT doc_id,
              ((((sb % 512) + 512) % 512) * 2654435761) % 2001 - 1000 AS wt
            FROM g),
      sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score
             FROM w GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
             COALESCE(sc.score, 0) >= 0 AS keep
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id"""))

  /** C131: hashed-logistic classifier TRAINING, as gate
    * distillation — the standard quality-classifier recipe (weak
    * rule labels -> learned scorer): 5 full-batch centered-GD
    * steps on the C25 Gopher gate's own pass/fail label, then the
    * trained model scores the corpus through the PUBLIC
    * [[TextFunctions.hashedLogisticScoreJoined]] scorer. Reaches
    * ~93% agreement with the gate at sf0.01 (majority class: 50.2%)
    * — the ln-length pseudo-feature learns the word-count rule, the
    * share features learn the stopword rule. The oracle unrolls the
    * identical steps as MATERIALIZED CTEs — fixed-point share
    * features, the algebraic sigmoid's pinned IEEE tree, truncated
    * errors, the sparse-centering offset algebra — so the hash-match
    * proves the whole training TRAJECTORY, not just the final
    * scoring pass. */
  val qTrainLr = Q(
    "qtext_train_lr",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val d = Tables(s, dir).documents
      val gate = TextFunctions.gopherGate(
          d.select(col("doc_id"), col("text")), col("text"),
          minTokens = 50, maxTokens = 100000, minMeanLen = 4, maxMeanLen = 10,
          minStopwords = 1)
        .select(col("doc_id"), col("passes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = TextFunctions.trainHashedLogistic(
          d.join(gate, "doc_id"), col("doc_id"), col("text"), col("passes"),
          nBuckets = 256L, steps = 5, lr = 500.0)
      TextFunctions.hashedLogisticScoreJoined(
          d, col("doc_id"), col("text"), model, nBuckets = 256L)
        .join(gate, "doc_id")
        .select(col("doc_id"), col("s_fp"),
          (col("s_fp") >= 0L).as("pred"),
          col("passes").cast("long").as("y"))
        .transform(Q.orderedDump(_, col("doc_id")))
    },
    Some(s"""
      WITH tk AS (SELECT doc_id, u.t AS t
             FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
             WHERE u.t <> ''),
      ${graft.Q.sqlutil.fnvSignedCtes("tk", "t", Seq("doc_id"), "tk")},
      dl AS (SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                 AS BIGINT) AS len
             FROM documents),
      fb AS (SELECT doc_id, ((sb % 256) + 256) % 256 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
             FROM tkg GROUP BY 1, 2),
      feats AS MATERIALIZED (
        SELECT doc_id, bucket, (fb.cnt * 1000000) // dl.len AS x
        FROM fb JOIN dl USING (doc_id)
        UNION ALL
        SELECT doc_id, CAST(-2 AS BIGINT),
               CAST(trunc(ln(1.0 + len) * 1e6) AS BIGINT) // 10
        FROM dl),
      $GopherMCte,
      lab AS MATERIALIZED (SELECT doc_id,
               CASE WHEN $GopherPassSql THEN 1 ELSE 0 END AS y
             FROM m),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      mu AS MATERIALIZED (SELECT bucket,
             CAST(SUM(x) AS BIGINT) // (SELECT n_docs FROM nd) AS m
           FROM feats GROUP BY 1),
      w0 AS (SELECT bucket, CAST(0 AS BIGINT) AS w FROM mu),
      c1 AS (SELECT COALESCE(SUM(w0.w * mu.m), 0) AS c0
             FROM w0 JOIN mu USING (bucket)),
      sr1 AS (SELECT doc_id, SUM(feats.x * w0.w) AS sraw
              FROM feats JOIN w0 USING (bucket) GROUP BY 1),
      er1 AS (SELECT doc_id, CAST(trunc((0.5 +
                (CAST(sraw - c0 AS DOUBLE) / 1e12)
                  / (2.0 * (1.0 + abs(CAST(sraw - c0 AS DOUBLE) / 1e12)))
                - CAST(y AS DOUBLE)) * 1e6) AS BIGINT) AS e_micro
              FROM sr1 JOIN lab USING (doc_id), c1),
      et1 AS (SELECT COALESCE(SUM(e_micro), 0) AS e_tot FROM er1),
      gr1 AS (SELECT bucket, SUM(er1.e_micro * feats.x) AS graw
              FROM feats JOIN er1 USING (doc_id) GROUP BY 1),
      w1 AS MATERIALIZED (SELECT bucket,
             w0.w - CAST(trunc(CAST(COALESCE(gr1.graw, 0) - mu.m * et1.e_tot
               AS DOUBLE) / 1e12 / CAST(nd.n_docs AS DOUBLE) * 500.0 * 1e6)
               AS BIGINT) AS w
           FROM w0 JOIN mu USING (bucket) LEFT JOIN gr1 USING (bucket), et1, nd),
      c2 AS (SELECT COALESCE(SUM(w1.w * mu.m), 0) AS c0
             FROM w1 JOIN mu USING (bucket)),
      sr2 AS (SELECT doc_id, SUM(feats.x * w1.w) AS sraw
              FROM feats JOIN w1 USING (bucket) GROUP BY 1),
      er2 AS (SELECT doc_id, CAST(trunc((0.5 +
                (CAST(sraw - c0 AS DOUBLE) / 1e12)
                  / (2.0 * (1.0 + abs(CAST(sraw - c0 AS DOUBLE) / 1e12)))
                - CAST(y AS DOUBLE)) * 1e6) AS BIGINT) AS e_micro
              FROM sr2 JOIN lab USING (doc_id), c2),
      et2 AS (SELECT COALESCE(SUM(e_micro), 0) AS e_tot FROM er2),
      gr2 AS (SELECT bucket, SUM(er2.e_micro * feats.x) AS graw
              FROM feats JOIN er2 USING (doc_id) GROUP BY 1),
      w2 AS MATERIALIZED (SELECT bucket,
             w1.w - CAST(trunc(CAST(COALESCE(gr2.graw, 0) - mu.m * et2.e_tot
               AS DOUBLE) / 1e12 / CAST(nd.n_docs AS DOUBLE) * 500.0 * 1e6)
               AS BIGINT) AS w
           FROM w1 JOIN mu USING (bucket) LEFT JOIN gr2 USING (bucket), et2, nd),
      c3 AS (SELECT COALESCE(SUM(w2.w * mu.m), 0) AS c0
             FROM w2 JOIN mu USING (bucket)),
      sr3 AS (SELECT doc_id, SUM(feats.x * w2.w) AS sraw
              FROM feats JOIN w2 USING (bucket) GROUP BY 1),
      er3 AS (SELECT doc_id, CAST(trunc((0.5 +
                (CAST(sraw - c0 AS DOUBLE) / 1e12)
                  / (2.0 * (1.0 + abs(CAST(sraw - c0 AS DOUBLE) / 1e12)))
                - CAST(y AS DOUBLE)) * 1e6) AS BIGINT) AS e_micro
              FROM sr3 JOIN lab USING (doc_id), c3),
      et3 AS (SELECT COALESCE(SUM(e_micro), 0) AS e_tot FROM er3),
      gr3 AS (SELECT bucket, SUM(er3.e_micro * feats.x) AS graw
              FROM feats JOIN er3 USING (doc_id) GROUP BY 1),
      w3 AS MATERIALIZED (SELECT bucket,
             w2.w - CAST(trunc(CAST(COALESCE(gr3.graw, 0) - mu.m * et3.e_tot
               AS DOUBLE) / 1e12 / CAST(nd.n_docs AS DOUBLE) * 500.0 * 1e6)
               AS BIGINT) AS w
           FROM w2 JOIN mu USING (bucket) LEFT JOIN gr3 USING (bucket), et3, nd),
      c4 AS (SELECT COALESCE(SUM(w3.w * mu.m), 0) AS c0
             FROM w3 JOIN mu USING (bucket)),
      sr4 AS (SELECT doc_id, SUM(feats.x * w3.w) AS sraw
              FROM feats JOIN w3 USING (bucket) GROUP BY 1),
      er4 AS (SELECT doc_id, CAST(trunc((0.5 +
                (CAST(sraw - c0 AS DOUBLE) / 1e12)
                  / (2.0 * (1.0 + abs(CAST(sraw - c0 AS DOUBLE) / 1e12)))
                - CAST(y AS DOUBLE)) * 1e6) AS BIGINT) AS e_micro
              FROM sr4 JOIN lab USING (doc_id), c4),
      et4 AS (SELECT COALESCE(SUM(e_micro), 0) AS e_tot FROM er4),
      gr4 AS (SELECT bucket, SUM(er4.e_micro * feats.x) AS graw
              FROM feats JOIN er4 USING (doc_id) GROUP BY 1),
      w4 AS MATERIALIZED (SELECT bucket,
             w3.w - CAST(trunc(CAST(COALESCE(gr4.graw, 0) - mu.m * et4.e_tot
               AS DOUBLE) / 1e12 / CAST(nd.n_docs AS DOUBLE) * 500.0 * 1e6)
               AS BIGINT) AS w
           FROM w3 JOIN mu USING (bucket) LEFT JOIN gr4 USING (bucket), et4, nd),
      c5 AS (SELECT COALESCE(SUM(w4.w * mu.m), 0) AS c0
             FROM w4 JOIN mu USING (bucket)),
      sr5 AS (SELECT doc_id, SUM(feats.x * w4.w) AS sraw
              FROM feats JOIN w4 USING (bucket) GROUP BY 1),
      er5 AS (SELECT doc_id, CAST(trunc((0.5 +
                (CAST(sraw - c0 AS DOUBLE) / 1e12)
                  / (2.0 * (1.0 + abs(CAST(sraw - c0 AS DOUBLE) / 1e12)))
                - CAST(y AS DOUBLE)) * 1e6) AS BIGINT) AS e_micro
              FROM sr5 JOIN lab USING (doc_id), c5),
      et5 AS (SELECT COALESCE(SUM(e_micro), 0) AS e_tot FROM er5),
      gr5 AS (SELECT bucket, SUM(er5.e_micro * feats.x) AS graw
              FROM feats JOIN er5 USING (doc_id) GROUP BY 1),
      w5 AS MATERIALIZED (SELECT bucket,
             w4.w - CAST(trunc(CAST(COALESCE(gr5.graw, 0) - mu.m * et5.e_tot
               AS DOUBLE) / 1e12 / CAST(nd.n_docs AS DOUBLE) * 500.0 * 1e6)
               AS BIGINT) AS w
           FROM w4 JOIN mu USING (bucket) LEFT JOIN gr5 USING (bucket), et5, nd),
      cf AS (SELECT COALESCE(SUM(w5.w * mu.m), 0) AS c0
             FROM w5 JOIN mu USING (bucket)),
      sf AS (SELECT doc_id, SUM(feats.x * w5.w) AS sraw
             FROM feats JOIN w5 USING (bucket) GROUP BY 1)
      SELECT doc_id, CAST(sraw - c0 AS BIGINT) AS s_fp,
             (sraw - c0) >= 0 AS pred, CAST(y AS BIGINT) AS y
      FROM sf JOIN lab USING (doc_id), cf
      ORDER BY doc_id"""))

  /** OOV rate vs the corpus's own top-100 vocabulary (C61). The
    * vocab boundary is integer-exact (tf desc, term asc — the tfidf
    * tie discipline) so membership never depends on a float; the
    * oracle rebuilds the identical vocab with SQL window rank. */
  /** C141: RAKE keyphrase extraction — stopword-delimited candidate
    * runs, degree/frequency word scores, phrase-sum ranking, top-5
    * per doc. Delimiters = the en stopword profile plus the corpus's
    * other filler token 'a'. The oracle replays the prefix-count run
    * ids, the cap, both integral score trees and the rank cut. */
  val qRake = Q(
    "qtext_rake",
    (s, dir) => {
      Keywords.rakeTopK(Tables(s, dir).documents, col("doc_id"), col("text"),
          stopwords = TextFunctions.StopwordWords.toMap.apply("en") :+ "a",
          k = 5, maxPhraseWords = 8)
        .orderBy(col("doc_id"), col("rank"))
    },
    Some {
      val sw = (TextFunctions.StopwordWords.toMap.apply("en") :+ "a")
        .map(w => s"'$w'").mkString(", ")
      s"""
      WITH t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
      tk AS (SELECT doc_id, i AS pos, t[CAST(i + 1 AS BIGINT)] AS term
             FROM t0, UNNEST(range(0, len(t))) AS u(i)),
      tk2 AS (SELECT * FROM tk WHERE term <> ''),
      r AS (SELECT doc_id, pos, term, term IN ($sw) AS is_stop,
              SUM(CASE WHEN term IN ($sw) THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS run
            FROM tk2),
      cand AS (SELECT doc_id, pos, term, run FROM r WHERE NOT is_stop),
      ph AS (SELECT doc_id, run, CAST(COUNT(*) AS BIGINT) AS plen,
               string_agg(term, ' ' ORDER BY pos) AS phrase
             FROM cand GROUP BY 1, 2 HAVING COUNT(*) <= 8),
      w AS (SELECT c.doc_id, c.term,
              (1000000 * CAST(SUM(ph.plen) AS BIGINT))
                // CAST(COUNT(*) AS BIGINT) AS wscore
            FROM cand c JOIN ph ON ph.doc_id = c.doc_id AND ph.run = c.run
            GROUP BY 1, 2),
      ps AS (SELECT c.doc_id, c.run, ph.phrase, ph.plen,
               CAST(SUM(w.wscore) AS BIGINT) AS score_micro
             FROM cand c
             JOIN ph ON ph.doc_id = c.doc_id AND ph.run = c.run
             JOIN w ON w.doc_id = c.doc_id AND w.term = c.term
             GROUP BY 1, 2, 3, 4),
      dd AS (SELECT doc_id, phrase,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               MAX(score_micro) AS score_micro,
               MAX(plen) AS n_words
             FROM ps GROUP BY 1, 2),
      rk AS (SELECT doc_id, phrase, n_occurrences, score_micro, n_words,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score_micro DESC, phrase ASC) AS BIGINT) AS rank
             FROM dd)
      SELECT doc_id, rank, phrase, n_words, n_occurrences, score_micro
      FROM rk WHERE rank <= 5
      ORDER BY doc_id, rank"""
    })

  /** The fixture taxonomy for C135 — single tokens plus two-word
    * phrases over the corpus vocabulary, shared verbatim by the Spark
    * frame and the oracle VALUES list. */
  private[graft] val TagDict: Seq[(String, String)] = Seq(
    "joins" -> "join", "joins" -> "merge", "joins" -> "hash join",
    "joins" -> "merge join",
    "layout" -> "table", "layout" -> "row", "layout" -> "column",
    "layout" -> "part",
    "exec" -> "scan", "exec" -> "filter", "exec" -> "sort",
    "exec" -> "window", "exec" -> "agg", "exec" -> "window agg",
    "perf" -> "fast", "perf" -> "slow", "perf" -> "small", "perf" -> "big")

  /** C135: dictionary tagging — taxonomy labels with word-boundary
    * phrase matching. The oracle rebuilds the 1- and 2-gram streams
    * with the proven positional-slice CTEs and joins the same VALUES
    * dictionary, so gram construction, phrase boundaries, bag counts
    * and distinct-term breadth are all hash-gated. */
  val qTag = Q(
    "qtext_tag",
    (s, dir) => {
      import s.implicits._
      Keywords.tagByDictionary(Tables(s, dir).documents,
          col("doc_id"), col("text"), TagDict.toDF("tag", "term"),
          maxWords = 2)
        .orderBy(col("doc_id"), col("tag"))
    },
    Some {
      val values = TagDict.map { case (t, w) => s"('$t', '$w')" }
        .mkString(",\n               ")
      s"""
      WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                    FROM documents),
      g1 AS (SELECT doc_id, u.x AS term FROM toks, UNNEST(t) AS u(x)),
      g2 AS (SELECT doc_id,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS term
             FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
             WHERE len(t) >= 2),
      g AS (SELECT * FROM g1 WHERE term <> ''
            UNION ALL SELECT * FROM g2 WHERE term <> ''),
      d(tag, term) AS (VALUES $values)
      SELECT g.doc_id, d.tag,
             CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(COUNT(DISTINCT g.term) AS BIGINT) AS n_terms
      FROM g JOIN d ON g.term = d.term
      GROUP BY 1, 2
      ORDER BY doc_id, tag"""
    })

  val qOov = Q(
    "qtext_oov",
    (s, dir) =>
      graft.functions.Keywords.oovRate(
          Tables(s, dir).documents, col("doc_id"), col("text"), vocabK = 100)
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                    FROM documents),
      t AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term <> '' GROUP BY doc_id, term),
      v AS (SELECT term FROM (
              SELECT term, ROW_NUMBER() OVER (ORDER BY SUM(tf) DESC, term) AS vr
              FROM t GROUP BY term) WHERE vr <= 100),
      sc AS (SELECT t.doc_id, SUM(t.tf) AS n_toks,
               SUM(CASE WHEN v.term IS NULL THEN t.tf ELSE 0 END) AS n_oov
             FROM t LEFT JOIN v ON t.term = v.term GROUP BY t.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(sc.n_toks, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(sc.n_oov, 0) AS BIGINT) AS n_oov,
        CASE WHEN sc.n_toks IS NULL THEN NULL
             ELSE ROUND(CAST(sc.n_oov AS DOUBLE) / sc.n_toks, 6)
        END AS oov_rate
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** Top-50 bigram collocations by PMI (C62), min pair count 3. The
    * PMI is one fixed double expression `(c12/c1)·(total/c2)` whose
    * `ln` is rounded once to micro-nats; rank is (pmi_micro desc,
    * bigram asc) — the micro-nat + integer-rank discipline the green
    * unigram/bigram oracles prove. */
  val qPmi = Q(
    "qtext_pmi",
    (s, dir) =>
      graft.functions.Keywords.pmiTopK(
        Tables(s, dir).documents, col("text"), k = 50, minCount = 3),
    Some("""
      WITH t AS (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
                 FROM documents),
      bg AS (SELECT w[i] AS w1, w[i+1] AS w2
             FROM t, UNNEST(range(1, len(w))) AS u(i)),
      c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
      l AS (SELECT w1, SUM(c12) AS c1 FROM c GROUP BY w1),
      r AS (SELECT w2, SUM(c12) AS c2 FROM c GROUP BY w2),
      n AS (SELECT SUM(c12) AS total FROM c),
      p AS (SELECT c.w1 || ' ' || c.w2 AS bigram, c.c12,
              CAST(l.c1 AS BIGINT) AS c1, CAST(r.c2 AS BIGINT) AS c2,
              CAST(ROUND(ln((CAST(c.c12 AS DOUBLE) / l.c1) *
                            (CAST(n.total AS DOUBLE) / r.c2)) * 1000000)
                   AS BIGINT) AS pmi_micro
            FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
            WHERE c.c12 >= 3),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER
               (ORDER BY pmi_micro DESC, bigram ASC) AS BIGINT) AS pmi_rank
             FROM p)
      SELECT pmi_rank, bigram, c12, c1, c2,
        CAST(pmi_micro AS DOUBLE) / 1000000 AS pmi
      FROM rk WHERE pmi_rank <= 50
      ORDER BY pmi_rank"""))

  /** Per-source PII prevalence rollup (C64): which sources carry how
    * much scrubbable PII — the corpus-management view over
    * [[TextFunctions.piiStats]] (qtext_scrub proves the per-doc
    * counts; this is the aggregate a curation decision actually
    * reads). PII is injected deterministically by doc-id residue mod
    * 4 — one class per residue 0/1/2 and residue 3 left CLEAN, so
    * every class AND the no-PII case all occur (non-vacuous in both
    * directions: a bug forcing any_pii constantly true would break
    * the docs_with_pii < n_docs rows); the rollup groups the
    * appended stat columns directly, no join-back. */
  val qPiiSources = Q(
    "qtext_pii_sources",
    (s, dir) => {
      val id = col("doc_id")
      val injected = concat(col("text"),
        when(pmod(id, lit(4)) === 0,
          concat(lit(" mail u"), id.cast("string"), lit("@ex.org")))
          .otherwise(lit("")),
        when(pmod(id, lit(4)) === 1, lit(" call +1 (555) 123-4567 now"))
          .otherwise(lit("")),
        when(pmod(id, lit(4)) === 2,
          concat(lit(" see https://ex.io/p/"), id.cast("string")))
          .otherwise(lit("")))
      TextFunctions.piiStats(
          Tables(s, dir).documents.withColumn("text", injected), col("text"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_urls")).as("n_urls"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_phones")).as("n_phones"),
          sum(when(col("any_pii"), 1L).otherwise(0L)).as("docs_with_pii"))
        .orderBy(col("source"))
    },
    Some {
      val (u, e, p) =
        (TextFunctions.UrlPattern, TextFunctions.EmailPattern, TextFunctions.PhonePattern)
      s"""
      WITH inj AS (
        SELECT doc_id, source, text ||
          CASE WHEN doc_id % 4 = 0
               THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org'
               ELSE '' END ||
          CASE WHEN doc_id % 4 = 1 THEN ' call +1 (555) 123-4567 now'
               ELSE '' END ||
          CASE WHEN doc_id % 4 = 2
               THEN ' see https://ex.io/p/' || CAST(doc_id AS VARCHAR)
               ELSE '' END AS t
        FROM documents),
      s1 AS (SELECT doc_id, source, t, regexp_replace(t, '$u', '<URL>', 'g') AS t1 FROM inj),
      s2 AS (SELECT doc_id, source, t, t1, regexp_replace(t1, '$e', '<EMAIL>', 'g') AS t2 FROM s1),
      c AS (SELECT doc_id, source,
              CAST(length(regexp_extract_all(t, '$u')) AS BIGINT) AS n_urls,
              CAST(length(regexp_extract_all(t1, '$e')) AS BIGINT) AS n_emails,
              CAST(length(regexp_extract_all(t2, '$p')) AS BIGINT) AS n_phones
            FROM s2)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_urls) AS BIGINT) AS n_urls,
        CAST(SUM(n_emails) AS BIGINT) AS n_emails,
        CAST(SUM(n_phones) AS BIGINT) AS n_phones,
        CAST(SUM(CASE WHEN n_urls + n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
      FROM c GROUP BY source ORDER BY source"""
    })

  // C68: overlapping token-window chunking (RAG / context-bounded
  // embedding prep). 32-token chunks every 24 tokens (8-token overlap)
  // — small enough that sf0.01's ~100-token docs produce real multi-
  // chunk coverage with a genuine short tail. Byte-exact chunk text
  // both sides; the start-emission rule (0, or previous chunk fell
  // short of the end) mirrored term-for-term.
  val qChunk = Q(
    "qtext_chunk",
    (s, dir) => {
      TextFunctions.chunkByTokens(Tables(s, dir).documents,
          col("doc_id"), col("text"), chunkLen = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               length(string_split(text, ' ')) AS n
        FROM documents WHERE text IS NOT NULL),
      s AS (
        SELECT doc_id, toks, n, unnest(range(0, greatest(n, 1), 24)) AS st
        FROM t)
      SELECT doc_id,
        CAST(st // 24 AS BIGINT) AS chunk_id,
        CAST(st AS BIGINT) AS start_tok,
        CAST(least(32, n - st) AS BIGINT) AS chunk_tokens,
        array_to_string(list_slice(toks, st + 1, st + 32), ' ') AS chunk
      FROM s
      WHERE st = 0 OR st - 24 + 32 < n
      ORDER BY doc_id, chunk_id"""))

  // C73: Flesch readability from three exact integer counts, the
  // formula one fixed IEEE tree (identical association both sides).
  val qReadability = Q(
    "qtext_readability",
    (s, dir) => {
      val m = TextFunctions.readability(col("text"))
      Tables(s, dir).documents.select(
          col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(length(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(CASE WHEN text IS NULL THEN NULL
               ELSE greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
               END AS BIGINT) AS n_sentences,
          CAST(length(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
      FROM m
      ORDER BY doc_id"""))

  // C70: perplexity bucketing — head/middle/tail on the integer
  // micro-nat mean (lp_sum div n_tokens; `div`/`//` both truncate
  // toward zero), cuts = exact integer thirds of the [min, max] range
  // computed in a 1-row CTE. Extends the green C37 oracle chain.
  // C70b: the quantile-cut bucket policy — the 100 TB path (range
  // thirds misbucket skewed score distributions; tertile cuts hold
  // ~equal doc counts). Approximate cut SELECTION by construction →
  // no DuckDB oracle (the q10b discipline: driver records rows-only);
  // KeywordsSpec pins it to the exact ECDF tertiles on fixtures where
  // the sketch is exact, and qtext_ppl_bucket keeps the byte-exact
  // oracle on the shared scoring chain.
  val qPplQuantile = Q(
    "qtext_ppl_quantile",
    (s, dir) =>
      Keywords.pplBucketsQuantile(Tables(s, dir).documents,
          col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    None)

  val qPplBuckets = Q(
    "qtext_ppl_bucket",
    (s, dir) =>
      Keywords.pplBuckets(Tables(s, dir).documents, col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      pd AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM toks WHERE term <> '' GROUP BY doc_id, term),
      v AS (SELECT term, SUM(cnt) AS tf FROM pd GROUP BY term),
      n AS (SELECT SUM(tf) AS total FROM v),
      lp AS (SELECT term,
               CAST(ROUND(ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000)
                    AS BIGINT) AS lp_micro
             FROM v CROSS JOIN n),
      sc AS (SELECT pd.doc_id, SUM(pd.cnt * lp.lp_micro) AS lp_sum,
               SUM(pd.cnt) AS n_toks
             FROM pd JOIN lp USING (term) GROUP BY pd.doc_id),
      scd AS (SELECT d.doc_id,
                CAST(COALESCE(sc.n_toks, 0) AS BIGINT) AS n_tokens,
                CASE WHEN sc.n_toks IS NULL THEN NULL
                     ELSE CAST(sc.lp_sum // sc.n_toks AS BIGINT) END AS lp_mean_micro
              FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id),
      st AS (SELECT MIN(lp_mean_micro) AS mn, MAX(lp_mean_micro) AS mx FROM scd)
      SELECT doc_id, n_tokens, lp_mean_micro,
        CASE WHEN lp_mean_micro IS NULL THEN 'unscored'
             WHEN lp_mean_micro >= mn + (2 * (mx - mn)) // 3 THEN 'head'
             WHEN lp_mean_micro >= mn + (mx - mn) // 3 THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM scd CROSS JOIN st
      ORDER BY doc_id"""))

  /** C69 oracle generator: one CTE block per merge round — pair count
    * (lateral-range unnest), 1-row argmax, then the greedy fold as a
    * `list_reduce` STATE MACHINE (state = out-tokens ␟-joined + ␞ +
    * held symbol; chr(30)/chr(31) can't collide with the printable-
    * ASCII symbol alphabet). A recursive CTE per round would re-run
    * its whole upstream chain once per ITERATION under DuckDB's
    * CTE-inlining (the verify-skill gotcha); the fold keeps each
    * round's reference count at 2, and MATERIALIZED stops even that
    * doubling where supported. Mirrors Keywords.bpeTrain's aggregate
    * fold branch-for-branch — a plain string replace would be wrong
    * in BOTH engines the same way, which is why the fold is spelled
    * out rather than shortcut. */
  /** The shared C69/C85 vocabulary chain `w0 → (p_r, b_r, w_r)*`:
    * carries `word` through every round so the APPLY oracle can key
    * the corpus tokenization on it (the train oracle simply ignores
    * the column — one chain, two consumers, a fold fix can't diverge
    * them). `w_r` reads `b_r` via LEFT JOIN ON TRUE, not a cross
    * join: when training exhausts pairs before `merges` rounds
    * (every word a single symbol), `b_r` is EMPTY — a cross join
    * would empty `w_r` and every later round, making the apply
    * oracle tokenize all words as atomic while the engine (which
    * stops early and keeps its vocabulary) segments normally; with
    * the null-padded join the fold's merge branch never fires and
    * `w_r` passes `w_{r-1}` through unchanged, mirroring
    * bpeTrain's early stop. */
  private def bpeChainCtes(merges: Int): String = {
    val sb = new StringBuilder(
      """WITH w0 AS MATERIALIZED (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wc,
           list_append(regexp_extract_all(word, '(?s).'), '</w>') AS syms
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
          FROM documents WHERE text IS NOT NULL)
    WHERE regexp_matches(word, '^[\x21-\x7e]+$')
    GROUP BY word)""")
    for (r <- 1 to merges) sb ++= s""",
    p$r AS (SELECT lft, rgt, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
        SELECT wc, syms[i] AS lft, syms[i+1] AS rgt FROM (
          SELECT wc, syms, unnest(range(1, length(syms))) AS i FROM w${r - 1}))
        GROUP BY lft, rgt),
    b$r AS (SELECT lft, rgt, lft || rgt AS m, cnt FROM p$r
             ORDER BY cnt DESC, lft, rgt LIMIT 1),
    w$r AS MATERIALIZED (
      SELECT word, wc, string_split(CASE WHEN split_part(st, chr(30), 2) = ''
                   THEN split_part(st, chr(30), 1)
                   WHEN split_part(st, chr(30), 1) = ''
                   THEN split_part(st, chr(30), 2)
                   ELSE split_part(st, chr(30), 1) || chr(31) || split_part(st, chr(30), 2)
                 END, chr(31)) AS syms
      FROM (
        SELECT word, wc, list_reduce(list_prepend(chr(30), syms),
          (acc, x) -> CASE
            WHEN split_part(acc, chr(30), 2) = b.lft AND x = b.rgt THEN
              (CASE WHEN split_part(acc, chr(30), 1) = '' THEN b.m
                    ELSE split_part(acc, chr(30), 1) || chr(31) || b.m END) || chr(30)
            WHEN split_part(acc, chr(30), 2) = '' THEN
              split_part(acc, chr(30), 1) || chr(30) || x
            ELSE
              (CASE WHEN split_part(acc, chr(30), 1) = '' THEN split_part(acc, chr(30), 2)
                    ELSE split_part(acc, chr(30), 1) || chr(31) || split_part(acc, chr(30), 2) END)
              || chr(30) || x
          END) AS st
        FROM w${r - 1} LEFT JOIN b$r b ON TRUE))"""
    sb.toString
  }

  private def bpeOracleSql(merges: Int): String =
    bpeChainCtes(merges) + "\n    " + (1 to merges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS step, lft AS l_sym, rgt AS r_sym, " +
        s"m AS merged, cnt AS pair_count FROM b$r").mkString(" UNION ALL ") +
      " ORDER BY step"

  /** C85 oracle: the trained chain's FINAL vocabulary frame (word →
    * folded syms) keys the corpus tokenization — per-occurrence merge
    * folding (the engine) and per-distinct-word folding joined back
    * (the oracle) are the same function of the word, so the token
    * streams must agree byte-for-byte. Non-conforming words pass
    * through as one atomic `word</w>` token in both formulations. */
  /** The per-doc tokenization CTE chain shared by the apply and
    * fertility oracles: the trained-vocabulary chain, then per-word
    * segmentation and per-doc (n_words, n_tokens, tokens) in `ag` —
    * docs with zero words have no `ag` row (the consumers COALESCE). */
  private def bpeTokCtes(merges: Int): String =
    bpeChainCtes(merges) + s""",
    dws AS (SELECT doc_id,
              list_filter(string_split(lower(COALESCE(text, '')), ' '), w -> w <> '') AS ws
            FROM documents),
    dwi AS (SELECT doc_id, i, ws[i] AS word FROM (
              SELECT doc_id, ws, unnest(range(1, length(ws) + 1)) AS i FROM dws)),
    tk AS (SELECT d.doc_id, d.i,
             CASE WHEN regexp_matches(d.word, '^[\\x21-\\x7e]+$$')
                  THEN COALESCE(v.syms, [d.word || '</w>'])
                  ELSE [d.word || '</w>'] END AS syms
           FROM dwi d LEFT JOIN w$merges v ON v.word = d.word),
    ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(length(syms)) AS BIGINT) AS n_tokens,
                  array_to_string(flatten(list(syms ORDER BY i)), ' ') AS tokens
           FROM tk GROUP BY doc_id)"""

  private def bpeApplyOracleSql(merges: Int): String =
    bpeTokCtes(merges) + s"""
    SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CASE WHEN a.n_words > 0
                THEN ROUND(CAST(a.n_tokens AS DOUBLE) / a.n_words, 6) END AS fertility,
           COALESCE(a.tokens, '') AS tokens
    FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id"""

  // C69: BPE vocabulary training — 4 merge rounds, full oracle parity
  // on (pair, merged form, exact weighted count) per round. 4 rounds
  // keeps the oracle's 2^r CTE re-evaluation harmless while still
  // exercising multi-round dynamics (round r's counts depend on round
  // r-1's fold being exactly right).
  val qBpe = Q(
    "qtext_bpe",
    (s, dir) => Keywords.bpeTrain(
      Tables(s, dir).documents, col("text"), merges = 4),
    Some(bpeOracleSql(4)))

  // C85: BPE tokenization with the learned table — train 4 merges on
  // the corpus (the proven C69 chain), then segment the SAME corpus
  // with them: the fertility/token-stream view a tokenizer decision
  // reads. The oracle keys tokenization on the chain's final
  // vocabulary frame; the engine folds merges per occurrence — same
  // function of the word, byte-exact `tokens` parity.
  val qBpeApply = Q(
    "qtext_bpe_apply",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Keywords.bpeApply(docs, col("doc_id"), col("text"),
        Keywords.bpeTrain(docs, col("text"), merges = 4))
        .orderBy(col("doc_id"))
    },
    Some(bpeApplyOracleSql(4)))

  // C125: per-source tokenizer fertility — the C85 tokenization
  // rolled up to the mixture-planning grain. The oracle reuses the
  // shared per-doc tokenization chain (bpeTokCtes) and adds only the
  // source join + grouped sums, so a mismatch isolates to the rollup.
  val qFertility = Q(
    "qtext_fertility",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Keywords.fertilityBySource(docs, col("doc_id"), col("text"),
          col("source"), Keywords.bpeTrain(docs, col("text"), merges = 4))
        .orderBy(col("source"))
    },
    Some(bpeTokCtes(4) + """,
    per AS (SELECT d.doc_id, d.source,
              COALESCE(a.n_words, 0) AS n_words,
              COALESCE(a.n_tokens, 0) AS n_tokens
            FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CASE WHEN SUM(n_words) > 0
                THEN ROUND(CAST(SUM(n_tokens) AS DOUBLE) / SUM(n_words), 6)
           END AS fertility
    FROM per GROUP BY source
    ORDER BY source"""))

  /** Shared C153 merge-table CTE chain `vocab → topw → chains → ded →
    * realm` (no WITH prefix: the apply oracle runs it under WITH
    * RECURSIVE). Mirrors Keywords.wordChainMerges at topWords = 256:
    * integer-exact (wc desc, word) rank, per-word build chains,
    * first-appearance pair dedupe, (rank, position) step numbering. */
  private val mergeChainCtes: String = """
    vocab AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents WHERE text IS NOT NULL)
      WHERE regexp_matches(word, '^[\x21-\x7e]+$')
      GROUP BY word),
    topw AS (SELECT word, wc, ROW_NUMBER() OVER (ORDER BY wc DESC, word) AS rk
             FROM (SELECT * FROM vocab ORDER BY wc DESC, word LIMIT 256)),
    chains AS (
      SELECT rk, j,
        CASE WHEN j < length(word) THEN substring(word, 1, j) ELSE word END AS l_sym,
        CASE WHEN j < length(word) THEN substring(word, j + 1, 1) ELSE '</w>' END AS r_sym,
        CASE WHEN j < length(word) THEN substring(word, 1, j + 1)
             ELSE word || '</w>' END AS merged
      FROM (SELECT rk, word, unnest(range(1, length(word) + 1)) AS j FROM topw)),
    ded AS (SELECT l_sym, r_sym, merged, rk, j,
              ROW_NUMBER() OVER (PARTITION BY l_sym, r_sym ORDER BY rk, j) AS dup
            FROM chains),
    realm AS (SELECT l_sym, r_sym, merged,
                CAST(ROW_NUMBER() OVER (ORDER BY rk, j) AS BIGINT) AS ord
              FROM ded WHERE dup = 1)"""

  // C153a: the word-chain merge-table bootstrap — every (step, pair,
  // merged form) hash-gated, so the apply query's table is itself
  // proven before it is applied.
  val qMergeChains = Q(
    "qtext_merge_chains",
    (s, dir) => Keywords.wordChainMerges(
        Tables(s, dir).documents, col("text"), topWords = 256)
      .orderBy(col("step")),
    Some("WITH " + mergeChainCtes + """
    SELECT ord AS step, l_sym, r_sym, merged FROM realm ORDER BY step"""))

  // C153: production-vocab BPE apply — the vocabulary-JOIN formulation
  // at a 1024-row merge table, 64× past bpeApply's literal-fold cap.
  // The real rows are the corpus word chains (they fire and interact:
  // an early word's chain pre-merges a later word's interior); the
  // inert '#k' pad rows mirror what a production 50k table looks like
  // against any one document — mostly non-firing merges the kernel
  // still has to scan. At 100 TB the table is a pay-once artifact you
  // persist; here it rebuilds per run (a bounded vocab agg).
  // The oracle REPLAYS all 1024 merges per distinct word as a
  // recursive CTE over steps (state = (word, step, syms); one
  // list_reduce state machine per step — the proven C69 fold), then
  // reassembles docs via the C85 chain. Byte-exact `tokens` parity.
  /** The 1024-row production-shaped merge table the vocab-grade gated
    * queries share: the corpus's real top-word merge chains padded to
    * 1024 with '#k' self-pair rows the oracle replays alongside
    * (bpeVocabTokCtes' fill arm — parity by replay, so the pad's
    * tokenizability never matters; the 32k query's corpus-proof
    * U+0001 pad is the realm-only-replay variant). */
  private def paddedVocab1024(s: SparkSession, docs: DataFrame): DataFrame = {
    val chains = Keywords.wordChainMerges(docs, col("text"), topWords = 256)
    val nReal = chains.count() // bounded: ≤ topWords · maxWordLen rows
    val nFill = math.max(0L, 1024L - nReal)
    val filler = s.range(1, nFill + 1).toDF("k")
      .select((col("k") + nReal).cast("long").as("step"),
        concat(lit("#"), col("k").cast("string")).as("l_sym"),
        concat(lit("#"), col("k").cast("string")).as("r_sym"),
        concat(lit("#"), col("k").cast("string"), lit("#"),
          col("k").cast("string")).as("merged"))
    chains.unionByName(filler)
  }

  val qBpeApplyVocab = Q(
    "qtext_bpe_apply_vocab",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"),
          paddedVocab1024(s, docs))
        .orderBy(col("doc_id"))
    },
    Some("WITH RECURSIVE " + mergeChainCtes + bpeVocabTokCtes() + """
    SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CASE WHEN a.n_words > 0
                THEN ROUND(CAST(a.n_tokens AS DOUBLE) / a.n_words, 6) END AS fertility,
           COALESCE(a.tokens, '') AS tokens
    FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id"""))

  // C153b: the C153 apply at the SHIPPED-tokenizer table size — the
  // same word chains plus 32768 inert pad rows. Pad symbols are
  // '\u0001k' — \u0001 (a control char) sits OUTSIDE the tokenizable alphabet
  // (wordChainMerges admits only [\x21-\x7e] words), so no real
  // symbol, at ANY corpus, can ever equal a pad symbol and no pad
  // rule can ever fire; a '#'-prefixed pad would be inert only for
  // corpora where no real merge happens to build '#'-forms. So the
  // Spark side genuinely broadcasts and kernel-scans a ~33k-row table
  // per distinct word while the oracle replays the real merges only
  // (inert rows are no-ops by CONSTRUCTION, not by corpus accident —
  // replaying 32k no-op recursive-CTE steps would only re-derive
  // that). Byte-exact `tokens` parity under the driver gate proves
  // the 1-row array broadcast, the kernel loop and the distinct-word
  // join shape all hold at production vocab size.
  val qBpeApply32k = Q(
    "qtext_bpe_apply_32k",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val chains = Keywords.wordChainMerges(docs, col("text"), topWords = 256)
      val nReal = chains.count() // bounded: ≤ topWords · maxWordLen rows
      val filler = s.range(1, 32769L).toDF("k")
        .select((col("k") + nReal).cast("long").as("step"),
          concat(lit("\u0001"), col("k").cast("string")).as("l_sym"),
          concat(lit("\u0001"), col("k").cast("string")).as("r_sym"),
          concat(lit("\u0001"), col("k").cast("string"), lit("\u0001"),
            col("k").cast("string")).as("merged"))
      Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"),
          chains.unionByName(filler))
        .orderBy(col("doc_id"))
    },
    Some("WITH RECURSIVE " + mergeChainCtes +
      bpeVocabTokCtes(includeFill = false) + """
    SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           CASE WHEN a.n_words > 0
                THEN ROUND(CAST(a.n_tokens AS DOUBLE) / a.n_words, 6) END AS fertility,
           COALESCE(a.tokens, '') AS tokens
    FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id"""))

  /** The C153 per-doc tokenization chain under the production-vocab
    * table (fill → mt → step-wise recursive replay → per-doc `ag`),
    * shared by the apply, production-fertility and 32k-table oracles —
    * one chain, three consumers, a replay fix can't diverge them.
    * `includeFill = false` replays the REAL merges only: the C153b
    * pad rows are PROVABLY inert at any corpus — their '\u0001k'
    * symbols contain a code point outside the [\x21-\x7e] word
    * alphabet, so no real segmentation symbol can ever equal one —
    * so the expected tokens are the realm-only replay while the Spark
    * side genuinely carries the full padded table; replaying 32k
    * no-op steps in a recursive CTE would only burn the oracle's time
    * re-deriving that no-op. */
  private def bpeVocabTokCtes(includeFill: Boolean = true): String = {
    val mt =
      if (includeFill) """
    fill AS (SELECT '#' || CAST(k AS VARCHAR) AS l_sym,
                    '#' || CAST(k AS VARCHAR) AS r_sym,
                    '#' || CAST(k AS VARCHAR) || '#' || CAST(k AS VARCHAR) AS merged,
                    CAST(k AS BIGINT) AS ord
             FROM (SELECT unnest(range(1, GREATEST(CAST(0 AS BIGINT),
                     1024 - (SELECT COUNT(*) FROM realm)) + 1)) AS k)),
    mt AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY grp, ord) AS BIGINT) AS step,
             l_sym, r_sym, merged
      FROM (SELECT 0 AS grp, ord, l_sym, r_sym, merged FROM realm
            UNION ALL SELECT 1, ord, l_sym, r_sym, merged FROM fill)),"""
      else """
    mt AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY ord) AS BIGINT) AS step,
             l_sym, r_sym, merged FROM realm),"""
    "," + mt + """
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mt),
    rec AS (
      SELECT word, CAST(0 AS BIGINT) AS st,
             list_append(regexp_extract_all(word, '(?s).'), '</w>') AS syms
      FROM vocab
      UNION ALL
      SELECT word, st + 1,
        string_split(CASE WHEN split_part(s2, chr(30), 2) = '' THEN split_part(s2, chr(30), 1)
                          WHEN split_part(s2, chr(30), 1) = '' THEN split_part(s2, chr(30), 2)
                          ELSE split_part(s2, chr(30), 1) || chr(31) || split_part(s2, chr(30), 2)
                     END, chr(31)) AS syms
      FROM (
        SELECT r.word AS word, r.st AS st, list_reduce(list_prepend(chr(30), r.syms),
          (acc, x) -> CASE
            WHEN split_part(acc, chr(30), 2) = m.l_sym AND x = m.r_sym THEN
              (CASE WHEN split_part(acc, chr(30), 1) = '' THEN m.merged
                    ELSE split_part(acc, chr(30), 1) || chr(31) || m.merged END) || chr(30)
            WHEN split_part(acc, chr(30), 2) = '' THEN
              split_part(acc, chr(30), 1) || chr(30) || x
            ELSE
              (CASE WHEN split_part(acc, chr(30), 1) = '' THEN split_part(acc, chr(30), 2)
                    ELSE split_part(acc, chr(30), 1) || chr(31) || split_part(acc, chr(30), 2) END)
              || chr(30) || x
          END) AS s2
        FROM rec r JOIN mt m ON m.step = r.st + 1)),
    fin AS (SELECT word, syms FROM rec WHERE st = (SELECT n FROM nm)),
    dws AS (SELECT doc_id,
              list_filter(string_split(lower(COALESCE(text, '')), ' '), w -> w <> '') AS ws
            FROM documents),
    dwi AS (SELECT doc_id, i, ws[i] AS word FROM (
              SELECT doc_id, ws, unnest(range(1, length(ws) + 1)) AS i FROM dws)),
    tk AS (SELECT d.doc_id, d.i, COALESCE(v.syms, [d.word || '</w>']) AS syms
           FROM dwi d LEFT JOIN fin v ON v.word = d.word),
    ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(length(syms)) AS BIGINT) AS n_tokens,
                  array_to_string(flatten(list(syms ORDER BY i)), ' ') AS tokens
           FROM tk GROUP BY doc_id)"""
  }

  // C125b: per-source fertility under the PRODUCTION-vocab table — the
  // C125 rollup inheriting C153's joined formulation (and exercising
  // bpeApplyJoined's carry path at driver level: `source` rides the
  // codegen stages and the id-keyed recovery join, no corpus
  // join-back). Oracle = the shared replay chain + the proven C125
  // rollup; the chain is referenced once (CTE-inlining discipline).
  val qFertilityVocab = Q(
    "qtext_fertility_vocab",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Keywords.fertilityBySourceJoined(docs, col("doc_id"), col("text"),
          col("source"), paddedVocab1024(s, docs))
        .orderBy(col("source"))
    },
    Some("WITH RECURSIVE " + mergeChainCtes + bpeVocabTokCtes() + """,
    per AS (SELECT d.doc_id, d.source,
              COALESCE(a.n_words, 0) AS n_words,
              COALESCE(a.n_tokens, 0) AS n_tokens
            FROM documents d LEFT JOIN ag a ON a.doc_id = d.doc_id)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CASE WHEN SUM(n_words) > 0
                THEN ROUND(CAST(SUM(n_tokens) AS DOUBLE) / SUM(n_words), 6)
           END AS fertility
    FROM per GROUP BY source
    ORDER BY source"""))

  // C162 batch twin, driver-gated (the qann_bq_bitcounts discipline):
  // the per-(source, quarter-bucket) fertility distribution the
  // streaming drift monitor PSIs — hash parity pins the exact bucket
  // rule ((4·n_tokens) div n_words over the joined apply) the pinned
  // reference table and every monitored window are built from.
  val qFertilityCounts = Q(
    "qtext_fertility_counts",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      Keywords.fertilityCounts(docs, col("doc_id"), col("text"),
          col("source"), paddedVocab1024(s, docs))
        .orderBy(col("grp"), col("bucket"))
    },
    Some("WITH RECURSIVE " + mergeChainCtes + bpeVocabTokCtes() + """,
    per AS (SELECT d.source, a.n_words, a.n_tokens
            FROM documents d JOIN ag a ON a.doc_id = d.doc_id
            WHERE a.n_words > 0)
    SELECT source AS grp,
           CAST((4 * n_tokens) // n_words AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM per GROUP BY 1, 2
    ORDER BY grp, bucket"""))

  // C126: inverted-index build at PHRASE (bigram) grain — this
  // corpus's unigram vocabulary is 31 near-ubiquitous terms (every df
  // band but one is empty), while its ~900 bigrams spread across the
  // whole df range, so the phrase index exercises both cut lines.
  // The df band [2, 100] keeps hapax noise and template-grade phrases
  // out of the postings; the sorted comma-joined postings string
  // makes the whole structure one hashable scalar per term.
  val qIndex = Q(
    "qtext_index",
    (s, dir) =>
      Keywords.invertedIndex(Tables(s, dir).documents,
          col("doc_id"), col("text"), n = 2, minDf = 2, maxDf = 100)
        .orderBy(col("term")),
    Some("""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents WHERE text IS NOT NULL),
      bg AS (SELECT doc_id,
               unnest([array_to_string(w[i:i+1], ' ')
                       FOR i IN range(1, greatest(len(w) - 1, 0) + 1)]) AS term
             FROM ws),
      toks AS (SELECT doc_id, term FROM bg WHERE term <> ''),
      td AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      agg AS (SELECT term,
                CAST(COUNT(*) AS BIGINT) AS df_docs,
                CAST(SUM(tf) AS BIGINT) AS tf_total,
                array_to_string(list_sort(list(doc_id)), ',') AS postings
              FROM td GROUP BY term)
      SELECT term, df_docs, tf_total, postings
      FROM agg WHERE df_docs BETWEEN 2 AND 100
      ORDER BY term"""))

  // C78: BM25 retrieval — contributions in single-rounded integer
  // micro-units off a pinned IEEE tree (the C37 discipline), summed
  // as longs, ranked on (score_micro desc, doc_id asc). The k1/b
  // constants are interpolated from the SAME Scala doubles the Spark
  // side folds (shortest-round-trip repr parses back bit-identical),
  // so the two engines literally share every constant in the tree.
  // The query set pins the edge semantics: q1 repeats a keyword
  // (deduped, not double-billed), q3 mixes a no-match term with a
  // real one (absent terms contribute nothing; the query still
  // retrieves on its real term).
  private val Bm25QueryTerms = Seq(
    "q1" -> "hash", "q1" -> "hash", "q1" -> "join",
    "q2" -> "vector", "q2" -> "scan", "q2" -> "slow",
    "q3" -> "zebra", "q3" -> "merge")
  val qBm25 = Q(
    "qtext_bm25",
    (s, dir) => {
      import s.implicits._
      Keywords.bm25TopK(Tables(s, dir).documents, col("doc_id"), col("text"),
          Bm25QueryTerms.toDF("query_id", "term"), k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25OracleSql))

  /** Shared BM25 CTE chain (assumes a `q(query_id, term)` CTE in
    * scope; emits toks/tf/dfreq/dl/st/c/sc/r) ending in `r` = the
    * ranked (query_id, doc_id, n_hit_terms, score_micro, rank) frame.
    * ONE definition so the three index-path oracles and the MRR eval
    * can't diverge from qtext_bm25's proven arithmetic. */
  private def bm25RankCtes(k1: Double = 1.2, b: Double = 0.75,
                           src: String = "documents"): String = s"""
      toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
               FROM $src),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks WHERE term <> '' GROUP BY 1, 2),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
      c AS (SELECT q.query_id, tf.doc_id,
              CAST(ROUND(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                            (CAST(df AS DOUBLE) + 0.5) + 1.0) *
                ((CAST(tf.tf AS DOUBLE) * ${k1 + 1}) /
                 (CAST(tf.tf AS DOUBLE) + $k1 * (${1 - b} + $b *
                   (CAST(dl.dl AS DOUBLE) /
                    (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
                1000000.0) AS BIGINT) AS contrib
            FROM tf JOIN q USING (term) JOIN dfreq USING (term)
              JOIN dl USING (doc_id) CROSS JOIN st),
      sc AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
               CAST(SUM(contrib) AS BIGINT) AS score_micro
             FROM c GROUP BY 1, 2),
      r AS (SELECT query_id, doc_id, n_hit_terms, score_micro,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
            FROM sc)"""

  private lazy val bm25OracleSql: String = {
      val vals = Bm25QueryTerms
        .map { case (q, t) => s"('$q','$t')" }.mkString(", ")
      s"""
      WITH q AS (SELECT DISTINCT query_id, lower(term) AS term
                 FROM (VALUES $vals) v(query_id, term)),
      ${bm25RankCtes()}
      SELECT query_id, rank, doc_id, n_hit_terms, score_micro
      FROM r WHERE rank <= 10
      ORDER BY query_id, rank"""
  }

  /** Shared QL CTE chain (assumes q/tf/dl/st CTEs in scope; emits
    * ctf/qv2/qs/hits/qbase/qsc/qr) ending in `qr` = the ranked QL
    * result. Mirrors [[Keywords.qlTopK]]'s decomposition: each ln
    * rounded once to micro-nats, integer arithmetic after; OOV query
    * terms drop at the inner ctf join exactly like the engine. */
  private def qlCtes(mu: Double): String = s"""
      ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
      qv2 AS (SELECT query_id, term, mu_p,
                CAST(ROUND(ln(mu_p) * 1e6) AS BIGINT) AS l2
              FROM (SELECT q.query_id, q.term,
                      $mu * (CAST(ctf.ctf AS DOUBLE) / CAST(st.total_tokens AS DOUBLE)) AS mu_p
                    FROM q JOIN ctf USING (term), st)),
      qs AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(l2) AS BIGINT) AS qconst
             FROM qv2 GROUP BY 1),
      hits AS (SELECT qv2.query_id, tf.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
                 CAST(SUM(CAST(ROUND(ln(CAST(tf.tf AS DOUBLE) + qv2.mu_p) * 1e6) AS BIGINT)
                   - qv2.l2) AS BIGINT) AS hit_micro
               FROM tf JOIN qv2 USING (term) GROUP BY 1, 2),
      qbase AS (SELECT qs.query_id, dl.doc_id,
                  qs.qconst - qs.n_terms *
                    CAST(ROUND(ln(CAST(dl.dl AS DOUBLE) + $mu) * 1e6) AS BIGINT) AS base_micro
                FROM dl, qs),
      qsc AS (SELECT qbase.query_id, qbase.doc_id,
                COALESCE(hits.n_hit_terms, 0) AS n_hit_terms,
                qbase.base_micro + COALESCE(hits.hit_micro, 0) AS score_micro
              FROM qbase LEFT JOIN hits
                ON hits.query_id = qbase.query_id AND hits.doc_id = qbase.doc_id),
      qr AS (SELECT query_id, doc_id,
               CAST(n_hit_terms AS BIGINT) AS n_hit_terms,
               CAST(score_micro AS BIGINT) AS score_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
             FROM qsc)"""

  private lazy val qlSharedHead: String = {
    val vals = Bm25QueryTerms.map { case (q, t) => s"('$q','$t')" }.mkString(", ")
    s"""
      WITH q AS (SELECT DISTINCT query_id, lower(term) AS term
                 FROM (VALUES $vals) v(query_id, term)),
      toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
               FROM documents),
      tf AS MATERIALIZED (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM toks WHERE term <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl)"""
  }

  /** C132: Dirichlet query-likelihood retrieval — the second classic
    * retrieval model next to BM25 (probabilistic length penalty,
    * corpus-LM smoothing of missing terms), every ln rounded once to
    * micro-nats so rank boundaries are exact integers in both
    * engines. The out-of-vocabulary query term ('zebra' in q3) drops
    * on BOTH sides by the same inner join. */
  val qQl = Q(
    "qtext_ql",
    (s, dir) => {
      import s.implicits._
      Keywords.qlTopK(Tables(s, dir).documents, col("doc_id"), col("text"),
          Bm25QueryTerms.toDF("query_id", "term"), k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(s"""$qlSharedHead,
      ${qlCtes(mu = 300.0)}
      SELECT query_id, rank, doc_id, n_hit_terms, score_micro
      FROM qr WHERE rank <= 10
      ORDER BY query_id, rank"""))

  /** C133: reciprocal-rank-fusion hybrid retrieval — BM25's lexical
    * ranking fused with QL's probabilistic one, `1/(60+rank)` each,
    * truncated once to 1e9 fixed-point; the oracle reruns BOTH
    * ranked chains off one shared token frame and mirrors the fusion
    * arithmetic, so the fused order is what the hash proves. */
  val qHybrid = Q(
    "qtext_hybrid_rrf",
    (s, dir) => {
      import s.implicits._
      val d = Tables(s, dir).documents
      val qs = Bm25QueryTerms.toDF("query_id", "term")
      // ONE index build serves both retrievers — the production shape.
      // Persisted: the index frames are consumed by both chains (and
      // twice within QL), and a lazy index would re-tokenize per read.
      val ix0 = Keywords.textIndex(d, col("doc_id"), col("text"))
      def p(f: org.apache.spark.sql.DataFrame) =
        f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ix = Keywords.TextIndex(p(ix0.postings), p(ix0.terms),
        p(ix0.docs), p(ix0.stats))
      val a = Keywords.bm25AgainstIndex(ix, qs, k = 20)
      val b = Keywords.qlAgainstIndex(ix, qs, k = 20)
      Keywords.rrfFuse(a, b, kRrf = 60, topK = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some {
      val k1 = 1.2; val b = 0.75
      s"""$qlSharedHead,
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      c AS (SELECT q.query_id, tf.doc_id,
              CAST(ROUND(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                            (CAST(df AS DOUBLE) + 0.5) + 1.0) *
                ((CAST(tf.tf AS DOUBLE) * ${k1 + 1}) /
                 (CAST(tf.tf AS DOUBLE) + $k1 * (${1 - b} + $b *
                   (CAST(dl.dl AS DOUBLE) /
                    (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) *
                1000000.0) AS BIGINT) AS contrib
            FROM tf JOIN q USING (term) JOIN dfreq USING (term)
              JOIN dl USING (doc_id) CROSS JOIN st),
      bsc AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_micro
              FROM c GROUP BY 1, 2),
      br AS (SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
             FROM bsc),
      ${qlCtes(mu = 300.0)},
      a AS (SELECT query_id, doc_id, rank FROM br WHERE rank <= 20),
      b AS (SELECT query_id, doc_id, rank FROM qr WHERE rank <= 20),
      f AS (SELECT COALESCE(a.query_id, b.query_id) AS query_id,
              COALESCE(a.doc_id, b.doc_id) AS doc_id,
              COALESCE(CAST(trunc(1e9 / (60.0 + CAST(a.rank AS DOUBLE))) AS BIGINT), 0)
                + COALESCE(CAST(trunc(1e9 / (60.0 + CAST(b.rank AS DOUBLE))) AS BIGINT), 0)
                AS rrf_nano
            FROM a FULL OUTER JOIN b
              ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
      fr AS (SELECT query_id, doc_id, rrf_nano,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rank
             FROM f)
      SELECT query_id, rank, doc_id, rrf_nano
      FROM fr WHERE rank <= 10
      ORDER BY query_id, rank"""
    })

  /** C127: the SAME search served from a parquet-round-tripped
    * [[Keywords.TextIndex]] — the build/search split under the SAME
    * oracle as qtext_bm25 (the qann_ivf_indexed precedent: oracle
    * equality proves the split changes the cost model, never the
    * answer). */
  val qBm25Indexed = Q(
    "qtext_bm25_indexed",
    (s, dir) => {
      import s.implicits._
      val ix = Keywords.textIndex(Tables(s, dir).documents,
        col("doc_id"), col("text"))
      // the four artifacts round-trip through the atomic
      // generation-publish path (one gen=<n> dir + commit marker, read
      // resolved once) — the driver gate thus pins that a published
      // generation serves the exact frames the build produced
      val base = graft.Q.scratchDir(s, "q_bm25idx")
      graft.sources.Layout.publishIndexVersion(s, base, Map(
        "postings" -> ix.postings, "terms" -> ix.terms,
        "docs" -> ix.docs, "stats" -> ix.stats))
      val (_, art) = graft.sources.Layout.readIndexVersion(s, base,
        Seq("postings", "terms", "docs", "stats"))
      val stored = Keywords.TextIndex(art("postings"), art("terms"),
        art("docs"), art("stats"))
      Keywords.bm25AgainstIndex(stored, Bm25QueryTerms.toDF("query_id", "term"),
          k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25OracleSql))

  /** C128: incremental index maintenance — index HALF the corpus,
    * append the other half as the "new crawl", search the result.
    * Oracle: qtext_bm25's, a THIRD time — append(half, half) must be
    * indistinguishable from indexing everything at once. */
  val qBm25Inc = Q(
    "qtext_bm25_inc",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val base = Keywords.textIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        col("doc_id"), col("text"))
      val grown = Keywords.textIndexAppend(base,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        col("doc_id"), col("text"))
      Keywords.bm25AgainstIndex(grown, Bm25QueryTerms.toDF("query_id", "term"),
          k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25OracleSql))

  /** Index DELETE propagation under the SAME oracle a fourth time
    * (qtext_bm25_inc's discipline inverted): append a junk quarter —
    * real documents re-id'd past the corpus (so the junk SHARES terms
    * with surviving docs: the df-subtract must land on terms that
    * remain, not just vanish) — then [[Keywords.textIndexRemove]] the
    * junk ids and search. The pruned index must be hash-identical to
    * never having indexed the junk at all; any residue in dfs, ctf,
    * dl or the stats row breaks equality with qtext_bm25's proven
    * oracle. */
  val qBm25Rm = Q(
    "qtext_bm25_rm",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val junk = docs.filter(pmod(col("doc_id"), lit(4)) === 3)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      val grown = Keywords.textIndexAppend(
        Keywords.textIndex(docs, col("doc_id"), col("text")),
        junk, col("doc_id"), col("text"))
      val pruned = Keywords.textIndexRemove(grown, junk.select(col("doc_id")))
      Keywords.bm25AgainstIndex(pruned, Bm25QueryTerms.toDF("query_id", "term"),
          k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25OracleSql))

  /** Re-crawl UPSERT under a genuinely-MODIFIED corpus oracle: a
    * quarter of the docs is re-crawled with two tokens appended
    * (changing their dl, the corpus total_tokens and avgdl — every
    * doc's score moves, not just the touched quarter's), the index
    * built on the ORIGINAL corpus is upserted with the new crawls,
    * and the search must hash-match DuckDB's replay over the
    * modified corpus. Any stale residue (old dl, double-counted dfs,
    * an un-removed posting) shifts score_micro and breaks parity. */
  private lazy val bm25UpsertOracleSql: String = {
    val vals = Bm25QueryTerms
      .map { case (q, t) => s"('$q','$t')" }.mkString(", ")
    s"""
      WITH docs2 AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 1
                  THEN text || ' graftrecrawl graftrecrawl'
                  ELSE text END AS text
           FROM documents),
      q AS (SELECT DISTINCT query_id, lower(term) AS term
            FROM (VALUES $vals) v(query_id, term)),
      ${bm25RankCtes(src = "docs2")}
      SELECT query_id, rank, doc_id, n_hit_terms, score_micro
      FROM r WHERE rank <= 10
      ORDER BY query_id, rank"""
  }

  val qBm25Upsert = Q(
    "qtext_bm25_upsert",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val recrawled = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
        .select(col("doc_id"),
          concat(col("text"), lit(" graftrecrawl graftrecrawl")).as("text"))
      val upserted = Keywords.textIndexUpsert(
        Keywords.textIndex(docs, col("doc_id"), col("text")),
        recrawled, col("doc_id"), col("text"))
      Keywords.bm25AgainstIndex(upserted, Bm25QueryTerms.toDF("query_id", "term"),
          k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25UpsertOracleSql))

  /** CDC index sync with all three change kinds LIVE in one gated
    * query: v2 drops a seventh of the corpus (removed), appends two
    * tokens to another seventh (changed), and adds re-id'd copies of
    * a third (added). The diff comes from the REAL corpusDiff
    * operator (payload-free md5 comparison), the sync pays index work
    * proportional to the change set, and the search must hash-match
    * DuckDB's replay over v2 — any unremoved posting, stale df, or
    * missed add breaks parity. */
  private lazy val bm25SyncOracleSql: String = {
    val vals = Bm25QueryTerms
      .map { case (q, t) => s"('$q','$t')" }.mkString(", ")
    s"""
      WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 1 THEN text || ' graftsync'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 7 != 5
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 2),
      q AS (SELECT DISTINCT query_id, lower(term) AS term
            FROM (VALUES $vals) v(query_id, term)),
      ${bm25RankCtes(src = "docs2")}
      SELECT query_id, rank, doc_id, n_hit_terms, score_micro
      FROM r WHERE rank <= 10
      ORDER BY query_id, rank"""
  }

  val qBm25Sync = Q(
    "qtext_bm25_sync",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val v2 = docs.filter(pmod(col("doc_id"), lit(7)) =!= 5)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 1,
            concat(col("text"), lit(" graftsync")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 2)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text")))
      val diff = graft.operators.Curation.corpusDiff(
        docs, v2, col("doc_id"), col("text"))
      val synced = Keywords.textIndexSync(
        Keywords.textIndex(docs, col("doc_id"), col("text")),
        diff, v2, col("doc_id"), col("text"))
      Keywords.bm25AgainstIndex(synced, Bm25QueryTerms.toDF("query_id", "term"),
          k = 10)
        .transform(Q.orderedDump(_, col("query_id"), col("rank")))
    },
    Some(bm25SyncOracleSql))

  /** C145: the MRR gate run as a SELF-RETRIEVAL eval — each of the
    * first 20 docs queries the index with its own first 3 tokens and
    * the doc itself is the relevant answer (the classic zero-label
    * retrieval sanity: near-1 MRR means the index finds its own
    * documents; a drop means tokenization/scoring broke). The oracle
    * reruns the SHARED bm25 chain under the generated query set and
    * mirrors the integer reciprocals. */
  val qMrr = Q(
    "qtext_mrr",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val queries = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"),
          explode(slice(split(lower(col("text")), " "), 1, 3)).as("term"))
        .filter(col("term") =!= "")
      val ranked = Keywords.bm25TopK(docs, col("doc_id"), col("text"),
        queries, k = 10)
      Keywords.mrrAtK(ranked,
        docs.filter(col("doc_id") < 20)
          .select(col("doc_id").as("query_id"), col("doc_id")))
    },
    Some(s"""
      WITH qsrc AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents WHERE doc_id < 20),
      q AS (SELECT DISTINCT doc_id AS query_id, term
            FROM (SELECT doc_id, unnest(w[1:3]) AS term FROM qsrc)
            WHERE term <> ''),
      ${bm25RankCtes()},
      hits AS (SELECT query_id, MIN(rank) AS first_hit
               FROM r WHERE rank <= 10 AND doc_id = query_id GROUP BY 1),
      perq AS (SELECT qsrc.doc_id AS query_id,
                 COALESCE(1000000 // hits.first_hit, 0) AS rr_micro
               FROM qsrc LEFT JOIN hits ON hits.query_id = qsrc.doc_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
             CAST(SUM(CASE WHEN rr_micro > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             ROUND(CAST(SUM(rr_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               / 1e6, 6) AS mrr
      FROM perq"""))

  /** C151: per-doc codepoint-class mix — integer range classification
    * only (no regex: Java and RE2 Unicode classes disagree at the
    * edges; ord/ascii agree by definition), one codegen map pass, the
    * four fractions each one rounded division. */
  val qScripts = Q(
    "qtext_scripts",
    (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          graft.functions.TextFunctions.charClassMix(col("text")).as("m"))
        .select(col("doc_id"), col("m.*"))
        .orderBy(col("doc_id")),
    Some("""
      WITH ch AS (SELECT doc_id, length(text) AS n,
              [ord(substring(text, i, 1)) FOR i IN range(1, length(text)+1)] AS cps
            FROM documents),
      c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
              CAST(len(list_filter(cps, x -> (x BETWEEN 65 AND 90)
                OR (x BETWEEN 97 AND 122))) AS BIGINT) AS n_letters,
              CAST(len(list_filter(cps, x -> x BETWEEN 48 AND 57)) AS BIGINT)
                AS n_digits,
              CAST(len(list_filter(cps, x -> x IN (32, 9, 10, 13))) AS BIGINT)
                AS n_spaces
            FROM ch)
      SELECT doc_id, n_chars, n_letters, n_digits, n_spaces,
             n_chars - n_letters - n_digits - n_spaces AS n_other,
             CASE WHEN n_chars > 0
                  THEN ROUND(CAST(n_letters AS DOUBLE) / n_chars, 6) END AS letter_frac,
             CASE WHEN n_chars > 0
                  THEN ROUND(CAST(n_digits AS DOUBLE) / n_chars, 6) END AS digit_frac,
             CASE WHEN n_chars > 0
                  THEN ROUND(CAST(n_spaces AS DOUBLE) / n_chars, 6) END AS space_frac,
             CASE WHEN n_chars > 0
                  THEN ROUND(CAST(n_chars - n_letters - n_digits - n_spaces
                    AS DOUBLE) / n_chars, 6) END AS other_frac
      FROM c ORDER BY doc_id"""))

  // C82: Zipf fit — every regression sum is an exact long over
  // once-rounded micro-nat points; the closed-form slope/intercept is
  // one pinned double tree mirrored term-for-term.
  val qZipf = Q(
    "qtext_zipf",
    (s, dir) => Keywords.zipfFit(
      Tables(s, dir).documents, col("doc_id"), col("text"), topN = 1000),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
      t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term <> '' GROUP BY term),
      r AS (SELECT term, tf,
              CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rank
            FROM t),
      m AS (SELECT
              CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
              CAST(ROUND(ln(CAST(tf AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
            FROM r WHERE rank <= 1000),
      su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
             FROM m),
      f AS (SELECT n, sx, sy,
              CASE WHEN n >= 2 AND
                (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
              THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              END AS slope_raw
            FROM su)
      SELECT n AS n_terms, ROUND(slope_raw, 6) AS slope,
        ROUND((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE)) /
              CAST(n AS DOUBLE), 6) AS intercept
      FROM f"""))

  /** C93: reference-LM JM scoring — reference = the en slice (the
    * Wikipedia stand-in), scored corpus = everything, λ = 0.8. The
    * oracle keys on strings (counts transfer across the hash keys)
    * and evaluates the identical pinned probability tree per distinct
    * (doc, bigram); MATERIALIZED keeps the ref model from re-running
    * per downstream reference. */
  val qLmRef = Q(
    "qtext_lm_ref",
    (s, dir) => {
      val d = Tables(s, dir).documents
      Keywords.jmRefLogProb(d, col("doc_id"), col("text"),
          d.filter(col("lang") === "en"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tk AS (SELECT doc_id,
              list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
            FROM documents),
      rtk AS MATERIALIZED (SELECT w FROM tk
            JOIN documents USING (doc_id) WHERE lang = 'en'),
      runi AS MATERIALIZED (SELECT x AS w, CAST(COUNT(*) AS BIGINT) AS c2
            FROM (SELECT UNNEST(w) AS x FROM rtk) GROUP BY x),
      tot AS (SELECT SUM(c2) + COUNT(*) AS nv FROM runi),
      rb AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM (SELECT w[i] AS w1, w[i+1] AS w2
                  FROM rtk, UNNEST(range(1, len(w))) u(i))
            GROUP BY w1, w2),
      rc AS MATERIALIZED (SELECT w1, SUM(c12) AS c1 FROM rb GROUP BY w1),
      dbt AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
                    FROM tk, UNNEST(range(1, len(w))) u(i))
              GROUP BY doc_id, w1, w2),
      sc AS (SELECT doc_id, tf,
              CAST(ROUND(ln((
                (CASE WHEN COALESCE(rc.c1, 0) > 0
                      THEN 800000.0 * (CAST(COALESCE(rb.c12, 0) AS DOUBLE)
                                       / CAST(rc.c1 AS DOUBLE))
                      ELSE 0.0 END
                 + 200000.0 * (CAST(COALESCE(ru.c2, 0) + 1 AS DOUBLE)
                               / CAST(tot.nv AS DOUBLE)))
                / 1000000.0)) * 1000000) AS BIGINT) AS lp
            FROM dbt
            LEFT JOIN rb USING (w1, w2)
            LEFT JOIN rc USING (w1)
            LEFT JOIN runi ru ON ru.w = dbt.w2
            CROSS JOIN tot),
      ag AS (SELECT doc_id, SUM(tf) AS nb, SUM(tf * lp) AS lps
             FROM sc GROUP BY doc_id)
      SELECT d.doc_id, CAST(COALESCE(ag.nb, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(ag.lps, 0) AS BIGINT) AS lp_micro_sum,
             CASE WHEN ag.nb IS NULL THEN NULL
                  ELSE CAST(ag.lps AS DOUBLE) / ag.nb / 1000000 END AS mean_logprob
      FROM documents d LEFT JOIN ag USING (doc_id)
      ORDER BY d.doc_id"""))

  /** C107: interpolated Kneser-Ney scoring against the English slice
    * as reference, D = 0.75 (exactly representable). The oracle keys
    * on strings and mirrors the pinned probability tree node-for-node:
    * `greatest(c12 − D, 0)/c1 + ((D·ctx)/c1)·pcont` seen,
    * add-1-over-types-smoothed continuation otherwise — any deviation
    * in the type counts (contexts-completed vs token frequency, the
    * KN distinction) breaks the micro-nat hash. */
  val qKnRef = Q(
    "qtext_kn_ref",
    (s, dir) => {
      val d = Tables(s, dir).documents
      Keywords.knRefLogProb(d, col("doc_id"), col("text"),
          d.filter(col("lang") === "en"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tk AS (SELECT doc_id,
              list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
            FROM documents),
      rtk AS MATERIALIZED (SELECT w FROM tk
            JOIN documents USING (doc_id) WHERE lang = 'en'),
      runi AS MATERIALIZED (SELECT x AS w, CAST(COUNT(*) AS BIGINT) AS c2
            FROM (SELECT UNNEST(w) AS x FROM rtk) GROUP BY x),
      rb AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM (SELECT w[i] AS w1, w[i+1] AS w2
                  FROM rtk, UNNEST(range(1, len(w))) u(i))
            GROUP BY w1, w2),
      rcx AS MATERIALIZED (SELECT w1, SUM(c12) AS c1,
              CAST(COUNT(*) AS BIGINT) AS ctx FROM rb GROUP BY w1),
      ct AS MATERIALIZED (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont
            FROM rb GROUP BY w2),
      tot AS (SELECT (SELECT COUNT(*) FROM rb) + (SELECT COUNT(*) FROM runi) AS bv),
      dbt AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
                    FROM tk, UNNEST(range(1, len(w))) u(i))
              GROUP BY doc_id, w1, w2),
      sc AS (SELECT doc_id, tf,
              CAST(ROUND(ln((
                CASE WHEN COALESCE(rcx.c1, 0) > 0
                  THEN (GREATEST(CAST(COALESCE(rb.c12, 0) AS DOUBLE)
                                 - (CAST(750000 AS DOUBLE) / 1000000.0), 0.0)
                        / CAST(rcx.c1 AS DOUBLE))
                     + (((CAST(750000 AS DOUBLE) / 1000000.0)
                         * CAST(rcx.ctx AS DOUBLE)) / CAST(rcx.c1 AS DOUBLE))
                       * (CAST(COALESCE(ct.cont, 0) + 1 AS DOUBLE)
                          / CAST(tot.bv AS DOUBLE))
                  ELSE CAST(COALESCE(ct.cont, 0) + 1 AS DOUBLE)
                       / CAST(tot.bv AS DOUBLE)
                END)) * 1000000) AS BIGINT) AS lp
            FROM dbt
            LEFT JOIN rb USING (w1, w2)
            LEFT JOIN rcx USING (w1)
            LEFT JOIN ct ON ct.w2 = dbt.w2
            CROSS JOIN tot),
      ag AS (SELECT doc_id, SUM(tf) AS nb, SUM(tf * lp) AS lps
             FROM sc GROUP BY doc_id)
      SELECT d.doc_id, CAST(COALESCE(ag.nb, 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(ag.lps, 0) AS BIGINT) AS lp_micro_sum,
             CASE WHEN ag.nb IS NULL THEN NULL
                  ELSE CAST(ag.lps AS DOUBLE) / ag.nb / 1000000 END AS mean_logprob
      FROM documents d LEFT JOIN ag USING (doc_id)
      ORDER BY d.doc_id"""))

  /** C96: exact heavy hitters via two-pass Misra-Gries, budget 32 —
    * terms above N/33 of the corpus (the ~30-term dominant head of
    * the synthetic vocabulary). The oracle is the EXACT full-vocab
    * aggregation with the same integer threshold: pass 1's sketch is
    * only a candidate generator with a superset guarantee, so the
    * two-pass result must equal the exact answer on any partitioning
    * — precisely what the hash compare proves. */
  val qHeavyHitters = Q(
    "qtext_heavyhitters",
    (s, dir) => {
      Keywords.heavyHitters(Tables(s, dir).documents, col("text"), budget = 32)
        .orderBy(col("n_occurrences").desc, col("term"))
    },
    Some("""
      WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS term
                    FROM documents),
      t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM toks WHERE term <> '' GROUP BY term),
      n AS (SELECT SUM(n_occurrences) AS total FROM t)
      SELECT term, n_occurrences,
             ROUND(CAST(n_occurrences AS DOUBLE) / total, 6) AS corpus_frac
      FROM t CROSS JOIN n
      WHERE n_occurrences * 33 > total
      ORDER BY n_occurrences DESC, term"""))

  val all: Seq[Q] = Seq(qTokens, qLangid, qQuality, qCalibrate, qFingerprint, qTfIdf, qScrub,
    qRepetition, qGopher, qVocab, qBoilerplate, qBoilerplateRm, qDomains,
    qUnigramLp, qBigramLp, qEntropy, qMojibake, qHtml, qNfc, qClassifier,
    qOov, qPmi, qPiiSources, qChunk, qBpe, qBpeApply, qMergeChains,
    qBpeApplyVocab, qBpeApply32k, qFertilityVocab, qFertilityCounts,
    qPplBuckets, qPplQuantile, qReadability,
    qBm25, qBm25Indexed, qBm25Inc, qBm25Rm, qBm25Upsert, qBm25Sync, qQl, qHybrid, qZipf, qLmRef, qKnRef,
    qHeavyHitters, qFertility, qIndex, qTrainLr, qTag, qRake, qMrr, qScripts)
}
