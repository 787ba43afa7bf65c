package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data pipelines
  * (SURVEY.md §2.C8-C10): language ID, quality scoring, token counting.
  *
  * Everything is built from codegen'd built-ins (`regexp_count`, string
  * ops, exact integer/double arithmetic) so the hot path stays inside
  * whole-stage codegen — at 100 TB these run as a single map stage over
  * the corpus with no shuffle.
  */
object TextFunctions {

  /** Whitespace token count (documents.text is single-space separated;
    * use tokenCountWsRegex for free-form whitespace). */
  def tokenCountWs(text: Column): Column = size(split(text, " "))

  /** Free-form whitespace token count. */
  def tokenCountWsRegex(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword segment count: runs of letters, runs of digits,
    * and single non-space symbols — the shape of a byte-pair pre-tokenizer
    * split, as a cheap proxy for LLM token budgeting. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Per-document codepoint-class mix (C151) — the script/charset
    * profile that runs BEFORE trigram language-ID (C8): a doc that is
    * 40% digits is a table dump, one that is mostly non-ASCII needs a
    * different langid model, and a code file shows a punctuation
    * fraction prose never has. Counts ASCII letters, digits,
    * whitespace (space/tab/CR/LF) and everything else over the
    * codepoint stream, plus the four fractions rounded once.
    *
    * Exactness: classification is pure integer codepoint-range
    * comparison (no regex — Java and RE2 classes disagree on Unicode
    * edges; `ascii()`/`ord()` agree by definition), counts are exact,
    * each fraction is ONE IEEE division rounded once. A zero-length
    * doc reports zero counts and NULL fractions (no honest
    * denominator). Scale: one codegen map pass per doc —
    * `filter`/`size` over the char array, no explode, nothing
    * shuffles. The single-`aggregate` fold (one scan, all classes in
    * a struct accumulator) was A/B'd solo at sf0.1 and is NOT faster:
    * fold 3.15/3.26 s vs filter 2.66/3.14 s across repeated runs —
    * the per-element struct allocation in the interpreted HOF lambda
    * costs more than three extra vectorized filter passes, so the
    * four-pass form stays. */
  def charClassMix(text: Column): Column = {
    val chars = split(text, "")
    def cnt(pred: Column => Column): Column =
      size(filter(chars, pred)).cast("long")
    graft.functions.Cols.let(length(text).cast("long")) { n =>
      val letters = cnt(c => (ascii(c) >= 65 && ascii(c) <= 90) ||
        (ascii(c) >= 97 && ascii(c) <= 122))
      val digits = cnt(c => ascii(c) >= 48 && ascii(c) <= 57)
      val spaces = cnt(c => ascii(c) === 32 || ascii(c) === 9 ||
        ascii(c) === 10 || ascii(c) === 13)
      def frac(c: Column): Column =
        when(n > 0, round(c.cast("double") / n.cast("double"), 6))
      graft.functions.Cols.let(letters) { lt =>
        graft.functions.Cols.let(digits) { dg =>
          graft.functions.Cols.let(spaces) { sp =>
            struct(n.as("n_chars"), lt.as("n_letters"), dg.as("n_digits"),
              sp.as("n_spaces"), (n - lt - dg - sp).as("n_other"),
              frac(lt).as("letter_frac"), frac(dg).as("digit_frac"),
              frac(sp).as("space_frac"),
              frac(n - lt - dg - sp).as("other_frac"))
          }
        }
      }
    }
  }

  // --- language ID (C8) -------------------------------------------------

  /** Public high-frequency stopwords per language — WORD LISTS are the
    * source of truth; the regex alternation is derived. (Deriving the
    * word list from the regex instead would silently break the moment
    * a profile used any regex feature — 'colou?r' would "match"
    * nothing as a literal token.) */
  val StopwordWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for",
      "on", "with", "as", "was", "at", "by"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit",
      "den", "nicht", "ein", "eine", "auf", "im"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es",
      "los", "las", "por", "con", "para"),
    "fr" -> Seq("le", "les", "de", "des", "et", "est", "un", "une",
      "dans", "que", "pour", "sur", "avec", "au"))

  /** The regex alternation form the hit counters use, derived from
    * [[StopwordWords]]. */
  val StopwordProfiles: Seq[(String, String)] =
    StopwordWords.map { case (l, ws) => l -> ws.mkString("(", "|", ")") }

  /** Count of profile-stopword hits for one language. */
  def stopwordHits(text: Column, lang: String): Column = {
    val pat = StopwordProfiles.toMap.getOrElse(
      lang, sys.error(s"no stopword profile for $lang"))
    regexp_count(lower(text), lit("\\b" + pat + "\\b"))
  }

  /** CJK character count (the zh signal — Latin profiles score 0 on CJK
    * text and vice versa). */
  def cjkHits(text: Column): Column =
    regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))

  /** Predicted language: argmax of profile hits, ties broken by the
    * fixed profile order en,de,es,fr,zh → first maximal wins. */
  def langId(text: Column): Column = {
    val scores: Seq[(String, Column)] =
      StopwordProfiles.map { case (l, _) => l -> stopwordHits(text, l) } :+ ("zh" -> cjkHits(text))
    val best = greatest(scores.map(_._2): _*)
    // Built back-to-front so the FIRST maximal lang wins the tie.
    scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best, lit(l)).otherwise(acc)
    }
  }

  // --- quality scoring (C9) ---------------------------------------------

  /** distinct-token ratio: 1.0 = no repetition, →0 = degenerate repeats. */
  def distinctTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")
  }

  /** Mean token length over whitespace tokens. */
  def meanTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      tokenCountWs(text).cast("double")

  /** English-stopword density per token. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") / tokenCountWs(text).cast("double")

  /** Composite quality score in [0,1]:
    * 0.4·distinct_ratio + 0.3·min(mean_len/8, 1) + 0.3·min(stop_ratio·5, 1).
    * The exact weights are a heuristic; the value is deterministic. */
  def qualityScore(text: Column): Column =
    round(
      lit(0.4) * distinctTokenRatio(text) +
      lit(0.3) * least(meanTokenLength(text) / lit(8.0), lit(1.0)) +
      lit(0.3) * least(stopwordRatio(text) * lit(5.0), lit(1.0)), 4)

  // --- hashed linear classifier (C49) -----------------------------------

  /** Hashing-trick linear text classifier score (fastText-style): each
    * whitespace token is hashed into one of `nBuckets` feature buckets
    * and the score is `bias + Σ weights(bucket(token))` — the shape of
    * every bag-of-words quality/safety classifier applied at corpus
    * scale (the weights come from an offline training run; this is the
    * INFERENCE pass). Weights are fixed-point integers (caller picks
    * the scale, e.g. 1e6 = micro-units) so the score is exact integer
    * arithmetic — reproducible across engines and partitionings, and
    * a keep threshold on the linear score is equivalent to one on the
    * sigmoid (monotone). Missing buckets weigh 0.
    *
    * The weight table rides the plan as a MAP LITERAL, so scoring is
    * one codegen map stage — zero shuffle, zero join. Right up to
    * ~10⁵ buckets (the plan/broadcast carries the map once per
    * executor); for million-bucket vocabularies use
    * [[hashedLinearScoreJoined]].
    */
  def hashedLinearScore(text: Column, weights: Map[Long, Long],
                        nBuckets: Long, bias: Long = 0L): Column = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.keys.forall(b => b >= 0 && b < nBuckets),
      s"weight buckets must lie in [0, $nBuckets)")
    val wmap = typedlit(weights)
    val toks = filter(split(text, " "), t => t =!= lit(""))
    aggregate(
      transform(toks, t => pmod(call_function("fnv1a64", t), lit(nBuckets))),
      lit(bias),
      (acc, b) => acc + coalesce(element_at(wmap, b), lit(0L)))
  }

  /** [[hashedLinearScore]] for weight tables too big for a plan
    * literal: `weights` is a `(bucket: long, w: long)` frame, joined
    * broadcast against the exploded token buckets and re-aggregated
    * per doc. One broadcast + one `(id, long)` partial-agg shuffle —
    * document payloads never move. `explode_outer` keeps zero-token
    * docs (they score `bias`), so the output has one row per DISTINCT
    * `id`: `(doc_id, score)`. Unlike the literal-map column (which is
    * per-row), duplicate ids collapse into one row scoring the merged
    * token stream with a single bias — pass a unique document key, or
    * dedup first ([[graft.operators.Profile.integrityProfile]] is the
    * audit for exactly this).
    */
  def hashedLinearScoreJoined(df: org.apache.spark.sql.DataFrame,
                              id: Column, text: Column,
                              weights: org.apache.spark.sql.DataFrame,
                              nBuckets: Long, bias: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    val toks = filter(split(text, " "), t => t =!= lit(""))
    df.select(id.as("doc_id"),
        explode_outer(transform(toks,
          t => pmod(call_function("fnv1a64", t), lit(nBuckets)))).as("bucket"))
      .join(broadcast(weights.select(col("bucket").as("wb"), col("w"))),
        col("bucket") === col("wb"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("w"), lit(0L))) + bias).as("score"))
  }

  /** Fixed-point hashed feature frame shared by the logistic TRAINER
    * ([[trainHashedLogistic]]) and its scorer
    * ([[hashedLogisticScoreJoined]]): per doc, every whitespace token
    * hashes into `pmod(fnv1a64(token), nBuckets)` and contributes its
    * L1-NORMALIZED share `x = cnt·1e6 div len` (an exact integer —
    * shares, not raw counts, or every feature is collinear with
    * document length and full-batch GD conditions terribly), plus one
    * pseudo-bucket −2 carrying `trunc(ln(1+len)·1e6) div 10` — the
    * log-length signal the shares deliberately normalize away (length
    * rules are what quality gates mostly cut on). A NULL/empty text
    * doc keeps its −2 row (x = 0), so it never silently drops out of
    * a training batch. Returns `(doc_id, bucket, x)`. */
  def hashedShareFeatures(df: org.apache.spark.sql.DataFrame,
                          id: Column, text: Column,
                          nBuckets: Long): org.apache.spark.sql.DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    val toks = coalesce(filter(split(text, " "), t => t =!= lit("")),
      array().cast("array<string>"))
    val base = df.select(id.as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("len"))
    val tokFeats = base
      .select(col("doc_id"), col("len"), explode(col("toks")).as("t"))
      .select(col("doc_id"), col("len"),
        pmod(call_function("fnv1a64", col("t")), lit(nBuckets)).as("bucket"))
      .groupBy(col("doc_id"), col("len"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("bucket"),
        expr("(cnt * 1000000L) div len").as("x"))
    val lenFeat = base.select(col("doc_id"), lit(-2L).as("bucket"),
      expr("CAST(ln(1.0D + len) * 1e6 AS LONG) div 10L").as("x"))
    tokFeats.unionByName(lenFeat)
  }

  /** Distributed full-batch training for a hashed linear text
    * classifier (C131) — the TRAIN half the C49 scorers have always
    * presumed ("the weights come from an offline training run"):
    * logistic-style gradient descent over [[hashedShareFeatures]],
    * with every quantity a pinned fixed-point integer so the whole
    * training TRAJECTORY is engine-reproducible (DuckDB-oracle-
    * checkable), not just spec-trusted.
    *
    * Features are MEAN-CENTERED — without centering the intercept must
    * crawl to −w̄·x̄ while the weights race ahead, and full-batch GD
    * stalls at the majority-class predictor for any practical step
    * count. Centering is implemented SPARSELY by the classic offset
    * trick (the feature frame is never densified):
    *   score_d = Σ_b x_db·w_b − C,       C = Σ_b w_b·m_b,
    *   grad_b  = Σ_d e_d·x_db − m_b·E,   E = Σ_d e_d,
    * where m_b = (Σ_d x_db) div n is the corpus mean feature. With
    * zero-mean features the optimal intercept for a balanced label is
    * logit(½) = 0, so no explicit bias is trained and `s ≥ 0` is the
    * decision boundary.
    *
    * Per step, entirely as DataFrame algebra:
    *   z_d = (Σx·w − C)/1e12 (x and w both 1e6-scaled),
    *   p_d = σ̃(z) with the ALGEBRAIC sigmoid σ̃(z) = 0.5 + z/(2(1+|z|))
    *         — rational arithmetic only, one pinned IEEE tree
    *         identical in any engine (libm `exp` is NOT guaranteed
    *         bit-identical across engines; σ̃ is monotone and keeps
    *         the logistic gradient's direction),
    *   e_d = trunc((p_d − y_d)·1e6)            (exact long),
    *   w_b −= trunc(lr · (g_b − m_b·E)/1e12/n · 1e6)  (one pinned tree).
    *
    * Scale shape: the feature frame is built ONCE (one tokenize+hash
    * pass, persisted); each step is one broadcast of the ≤nBuckets+1-
    * row weight table onto it, one per-doc and one per-bucket
    * partial-agg shuffle (ids and longs only — text never moves after
    * featurization). The MODEL STATE (w, m, C, E, n) lives on the
    * driver — the d×d-PCA / BPE-merge-table convention for bounded
    * model-sized frames: per step exactly TWO model-sized collects
    * (the ≤nBuckets+1-row gradient and the 1-row error total) and the
    * fixed-point update arithmetic runs in plain Scala with
    * bit-identical semantics (Long wrap ≡ Spark non-ANSI long sum,
    * BigDecimal exactness ≡ decimal(38,0), BigDecimal.doubleValue ≡
    * the decimal→double cast, Double.toLong ≡ the double→long cast).
    * The r17 optimization pass measured the previous all-DataFrame
    * weight pipeline (per-step broadcast-join tree + eager
    * localCheckpoint to keep the planner from re-walking the unrolled
    * history) at ~26 scheduler jobs per GD step — 129 jobs, 7.3 s at
    * sf0.1, nearly all fixed per-job overhead on a 257-row frame; the
    * driver-held model runs the same trajectory in ~4 jobs per step.
    *
    * Returns the model frame `(bucket, w, m)` (weights AND centering
    * means, both 1e6 fixed-point) — [[hashedLogisticScoreJoined]]'s
    * input contract. */
  def trainHashedLogistic(df: org.apache.spark.sql.DataFrame,
                          id: Column, text: Column, label: Column,
                          nBuckets: Long, steps: Int,
                          lr: Double): org.apache.spark.sql.DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(lr > 0, s"lr must be positive, got $lr")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = hashedShareFeatures(df, id, text, nBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: read once per GD step (the margin join); two longs a
    // row. Dropped with every other signature cache by clearCache.
    val labels = df.select(id.as("doc_id"), label.cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE model-sized collect seeds everything: the −2 length
    // pseudo-bucket appears EXACTLY once per document (including
    // NULL/empty-text docs — the hashedShareFeatures contract), so its
    // row count IS n_docs and no separate count job runs. m = sx div n
    // — Java long division ≡ Spark's IntegralDivide on longs
    // (truncation toward zero; x ≥ 0 here anyway).
    val sxRows: Array[(Long, Long, Long)] = feats.groupBy(col("bucket"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs: Long = sxRows.collectFirst { case (-2L, _, c) => c }.getOrElse(0L)
    val muRows: Array[(Long, Long)] = sxRows
      .map { case (b, sx, _) => b -> (if (nDocs == 0) 0L else sx / nDocs) }
    val w = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val zero = java.math.BigDecimal.ZERO
    for (_ <- 0 until steps) {
      // C = Σ w_b·m_b: Long multiply+sum with wrap semantics — exactly
      // Spark's non-ANSI long arithmetic, and order-independent
      val c0: Long = muRows.map { case (b, mb) => w(b) * mb }.sum
      val wDf = muRows.map { case (b, _) => (b, w(b)) }.toSeq
        .toDF("bucket", "w") // LocalRelation: broadcasts without a job
      val errs = feats.join(broadcast(wDf), "bucket")
        .groupBy(col("doc_id"))
        .agg(sum(col("x") * col("w")).as("sraw"))
        .join(labels, "doc_id")
        .select(col("doc_id"), {
          val z = (col("sraw") - lit(c0)).cast("double") / lit(1e12)
          val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
          ((p - col("y").cast("double")) * lit(1e6)).cast("long").as("e_micro")
        })
      // decimal(38,0) accumulation: each |e_micro·x| term is ≤ 1e12,
      // so a LONG sum wraps silently past ~9e6 feature rows per
      // bucket while the DuckDB oracle promotes to HUGEINT. A
      // decimal sum is exact to 38 digits (the HUGEINT behavior),
      // and the exact integer → double conversion rounds to nearest
      // in both engines, so parity holds at any corpus size.
      // ONE model-sized collect per step: E = Σ_d e_d rides the SAME
      // aggregate as the per-bucket e·x sums — the −2 pseudo-bucket
      // holds exactly one feats row per document, so its per-bucket
      // Σe IS the total (decimal sums are exact, hence
      // order-independent), and errs is consumed once so it needs no
      // cache boundary.
      val gradRows: Array[(Long, java.math.BigDecimal, java.math.BigDecimal)] =
        feats.join(errs, "doc_id")
          .groupBy(col("bucket"))
          .agg(sum((col("e_micro") * col("x")).cast("decimal(38,0)")).as("graw"),
            sum(col("e_micro").cast("decimal(38,0)")).as("esum"))
          .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2)))
      val grad: Map[Long, java.math.BigDecimal] =
        gradRows.map(t => t._1 -> t._2).toMap
      val eTot: java.math.BigDecimal =
        gradRows.collectFirst { case (-2L, _, e) => e }.getOrElse(zero)
      // w_b −= trunc(lr·(g_b − m_b·E)/1e12/n·1e6): BigDecimal
      // subtract/multiply are exact (≡ decimal(38,0) below overflow),
      // doubleValue is the decimal→double cast, the double chain is
      // the same left-associated IEEE tree, toLong is the double→long
      // truncation — one pinned tree, bit-identical to the DataFrame
      // form this replaced (oracle-checked at sf0.001/0.01/0.1)
      muRows.foreach { case (b, mb) =>
        val diff = grad.getOrElse(b, zero)
          .subtract(java.math.BigDecimal.valueOf(mb).multiply(eTot))
        val step = diff.doubleValue / 1e12 / nDocs.toDouble * lr * 1e6
        w(b) = w(b) - step.toLong
      }
    }
    muRows.map { case (b, mb) => (b, w(b), mb) }.toSeq.toDF("bucket", "w", "m")
  }

  /** Score documents with a [[trainHashedLogistic]] model frame:
    * `s_fp = Σ_b x_db·w_b − Σ_b w_b·m_b` in 1e12 fixed-point (x and w
    * are each 1e6-scaled; divide by 1e12 for the real-valued margin —
    * `s_fp ≥ 0` is the trained decision). Buckets unseen at train
    * time drop out of the inner join — exactly weight 0 — and every
    * doc still scores via its −2 length row (always in the model).
    * One broadcast of the model, one per-doc partial-agg shuffle, one
    * 1-row offset crossJoin: document payloads never move. */
  def hashedLogisticScoreJoined(df: org.apache.spark.sql.DataFrame,
                                id: Column, text: Column,
                                model: org.apache.spark.sql.DataFrame,
                                nBuckets: Long): org.apache.spark.sql.DataFrame = {
    val cFrame = model
      .agg(coalesce(sum(col("w") * col("m")), lit(0L)).as("c0"))
    hashedShareFeatures(df, id, text, nBuckets)
      .join(broadcast(model.select(col("bucket"), col("w"))), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("x") * col("w")).as("sraw"))
      .crossJoin(broadcast(cFrame))
      .select(col("doc_id"), (col("sraw") - col("c0")).as("s_fp"))
  }

  /** Normalization for exact dedup: lowercase, trim, collapse runs of
    * whitespace. Byte-level only — for Unicode corpora compose with
    * [[nfcNormalize]] first so canonically-equivalent spellings (é
    * composed vs `e`+U+0301) collapse before hashing. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Unicode NFC canonicalization (C46) via the codegen
    * [[NfcNormalize]] expression — the step BEFORE any hash-keyed
    * operator (exact dedup, MinHash shingles, fingerprints) on
    * web-scraped text, where composed and decomposed spellings of the
    * same characters otherwise hash apart. Caller must have graft's
    * extensions registered (GraftSession does). */
  def nfcNormalize(text: Column): Column =
    call_function("graft_nfc", text)

  // --- PII / URL scrubbing (C21) ---------------------------------------
  // Redaction before training is the most common curation step this
  // surface was missing. All three classes are codegen'd regexp_replace
  // column exprs — a pure map stage, no shuffle. The patterns are
  // deliberately cross-engine portable: no lookaround (RE2 lacks it) and
  // explicit whitespace classes (Java's \s includes \x0B, RE2's does
  // not), so the DuckDB oracle can run the byte-identical regex.

  /** http(s) URL up to the next whitespace. */
  val UrlPattern = "https?://[^ \\t\\n\\r]+"
  /** email address (pragmatic RFC subset). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** phone number: optional +, then ≥8 chars of digits/space/()/- with
    * digit ends — long enough to skip prose numbers like "12 of 30".
    * '.' is deliberately NOT a separator: with it, IP addresses,
    * dotted versions, and decimal runs ("192.168.100.200", "3.14159
    * 2.71828") all redact as phones, and RE2 has no lookaround to
    * carve them back out. The cost is missing dot-separated phones
    * ("555.123.4567") — scrubbing for training favors that tradeoff's
    * direction, and the remaining false positive (8+ chars of pure
    * digit/space/dash groups, e.g. "2024 2025 2026") is phone-shaped
    * by construction. */
  val PhonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Log-path phone variant: refuses matches that start at an ISO
    * date (`2024-01-01` is phone-shaped to [[PhonePattern]]) or start
    * mid-digit-run / after a dash (which would redact a date's TAIL,
    * or a dashed id like `task-12345678`). Uses lookaround — fine
    * HERE because this variant backs the spec-gated forwarder path,
    * not a DuckDB oracle; [[PhonePattern]] stays lookaround-free for
    * cross-engine parity. The cost: dash-attached digit runs are no
    * longer redacted on the log path — in log text those are ids, not
    * phones. */
  val PhonePatternLogSafe: String =
    "(?<![0-9-])(?!\\d{4}-\\d{2}-\\d{2})" + PhonePattern

  def redactUrls(text: Column): Column =
    regexp_replace(text, lit(UrlPattern), lit("<URL>"))
  def redactEmails(text: Column): Column =
    regexp_replace(text, lit(EmailPattern), lit("<EMAIL>"))
  def redactPhones(text: Column): Column =
    regexp_replace(text, lit(PhonePattern), lit("<PHONE>"))
  def redactPhonesLogSafe(text: Column): Column =
    regexp_replace(text, lit(PhonePatternLogSafe), lit("<PHONE>"))

  /** Full scrub, order-sensitive: URLs first (an email-shaped substring
    * inside a URL query string must disappear as part of the URL), then
    * emails, then phones (the placeholders carry no digits, so phone
    * scrubbing can never eat an earlier redaction). */
  def redactPii(text: Column): Column =
    redactPhones(redactEmails(redactUrls(text)))

  /** [[redactPii]] with the log-safe phone variant — for text that
    * embeds ISO timestamps (raw log lines), where the plain pattern
    * would redact every leading date as a phone. */
  def redactPiiLogSafe(text: Column): Column =
    redactPhonesLogSafe(redactEmails(redactUrls(text)))

  /** PII prevalence audit (SURVEY.md §2.C64): appends per-row match
    * counts for each redaction class — the measurement run BEFORE
    * deciding to scrub (how much PII is in this corpus, which sources
    * carry it, what will redaction cost?). Counts mirror
    * [[redactPii]]'s ORDER exactly — URLs counted on the raw text,
    * emails on the URL-redacted text, phones on the email-redacted
    * text — so `n_urls + n_emails + n_phones` IS the number of
    * replacements the scrub would make (an email-shaped substring
    * inside a URL counts once, as the URL, matching the scrub's
    * single-redaction behavior; independent per-class counts on raw
    * text would double-count it). Patterns are the SAME shared
    * constants the scrub and its byte-exact green oracle use, so
    * count and rewrite cannot silently diverge. APPENDS columns
    * (refusing name collisions — the gopherGate contract) instead of
    * projecting an id-keyed frame, so a per-source/per-split rollup
    * groups directly with no join-back shuffle. A pure codegen map
    * stage — no shuffle, no join, the cheapest audit shape at
    * 100 TB. */
  def piiStats(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame = {
    val reserved = Seq("n_urls", "n_emails", "n_phones", "any_pii")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"piiStats appends column '$c' but the input already has one"))
    val afterUrls = redactUrls(text)
    val afterEmails = redactEmails(afterUrls)
    // counts are coalesced: regexp_count(NULL) is NULL, and a NULL
    // any_pii would make a NULL-text row vanish from BOTH sides of a
    // clean/dirty filter — an audit must report 0/false for no-text
    def cnt(on: Column, pat: String): Column =
      coalesce(regexp_count(on, lit(pat)).cast("long"), lit(0L))
    df.withColumn("n_urls", cnt(text, UrlPattern))
      .withColumn("n_emails", cnt(afterUrls, EmailPattern))
      .withColumn("n_phones", cnt(afterEmails, PhonePattern))
      .withColumn("any_pii",
        (col("n_urls") + col("n_emails") + col("n_phones")) > 0)
  }

  /** HTML → text extraction (C45) — the web-scrape cleaning step a
    * pretraining pipeline runs before every text metric: drop
    * script/style blocks WITH their content, strip remaining tags,
    * decode the basic entities, collapse whitespace. Order matters and
    * is part of the contract: blocks before tags (a stripped `<script>`
    * tag would orphan its payload into the text), entities AFTER tag
    * stripping (`&lt;3` must survive as `<3`, not get eaten as a tag),
    * `&amp;` LAST among entities (single-pass semantics: `&amp;lt;`
    * decodes to the literal `&lt;`, not `<`). The tag pattern requires
    * a LETTER (or `!` — comments/doctype) after `<`, the HTML5 lexer
    * rule: a bare `<` in prose ("3 < 5", an unescaped "<3") is text,
    * not a tag, and must survive — a naive `<[^>]+>` would eat the
    * span to the next `>`. Same cross-engine regex discipline as the
    * scrub patterns — inline `(?is)` flags, lazy `.*?`, explicit
    * whitespace class, no lookaround — so Java and RE2 read every
    * pattern identically and the rewrite is byte-exact under the
    * DuckDB oracle. A codegen map stage: three regexp_replace + six
    * replace, no UDF. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      lit("(?is)<(script|style)[^>]*>.*?</(script|style)>"), lit(" "))
    val noTags = regexp_replace(noBlocks, lit("</?[a-zA-Z!][^>]*>"), lit(" "))
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, lit("[ \t\r\n]+"), lit(" ")))
  }

  /** URL host with a capture group: the same `https?://` anchor as
    * [[UrlPattern]], host = a run of hostname-legal characters
    * (letters/digits/dot/hyphen/underscore) plus an optional `:port`.
    * The POSITIVE character class matters: a negated up-to-delimiter
    * class would swallow prose punctuation ("https://a.io, then" →
    * domain "a.io,") and fuse adjacent URLs ("https://a.io,https://b.io"
    * → "a.io,https:") — junk keys a blocklist would never match, and
    * invisible to the oracle because both engines share the regex.
    * The required alphanumeric FINAL char keeps a sentence-ending dot
    * out of the host ("https://b.io." → "b.io", not "b.io.").
    * Same cross-engine discipline as the scrub patterns (no
    * lookaround; `(?:...)` is fine in both Java and RE2). Ports stay
    * attached (`host:8080` is a distinct origin — a blocklist can
    * normalize later). */
  val UrlHostPattern = "https?://([A-Za-z0-9._-]*[A-Za-z0-9](?::[0-9]+)?)"

  /** All URL host domains in a text, lowercased, occurrence order —
    * a pure codegen map expression (no shuffle). One occurrence per
    * URL: the per-domain aggregation is [[domainStats]]' business. */
  def urlDomains(text: Column): Column =
    transform(regexp_extract_all(text, lit(UrlHostPattern), lit(1)), d => lower(d))

  /** URL canonicalization (C55) — the normalization every web-corpus
    * URL dedup keys on: the same page arrives under casing, fragment,
    * default-port, `www.`, tracking-parameter and parameter-order
    * variants, and naive exact-match dedup keeps them all. The chain
    * (order is the contract): strip `#fragment` → lowercase scheme and
    * host (path case PRESERVED — paths are case-sensitive) → strip
    * `www.` and the scheme's default port (`:80` http / `:443` https)
    * → drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`) and
    * empty params → SORT surviving params (order-insensitive match) →
    * strip trailing slashes. Scheme-less input is returned unchanged
    * (not a URL — don't invent one). A pure codegen map expression —
    * regexp_extract/replace + one small array sort per row, no
    * shuffle; cross-engine-safe regexes (anchored classes, no
    * lookaround), array_sort/list_sort agree on ASCII. */
  def canonicalizeUrl(url: Column): Column =
    Cols.let(regexp_replace(url, "#.*$", "")) { nf =>
      Cols.let(lower(regexp_extract(nf, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))) { scheme =>
        Cols.let(regexp_replace(
            lower(regexp_extract(nf, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
            "^www\\.", "")) { h1 =>
          Cols.let(regexp_extract(nf, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)) { pq =>
            Cols.let(when(instr(pq, "?") > 0, pq.substr(lit(1), instr(pq, "?") - 1))
                .otherwise(pq)) { path =>
              Cols.let(array_join(array_sort(filter(
                  split(when(instr(pq, "?") > 0,
                      pq.substr(instr(pq, "?") + 1, length(pq))).otherwise(lit("")), "&"),
                  p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))),
                "&")) { sq =>
                when(scheme === "", url).otherwise(concat(
                  scheme, lit("://"),
                  when(scheme === "http", regexp_replace(h1, ":80$", ""))
                    .when(scheme === "https", regexp_replace(h1, ":443$", ""))
                    .otherwise(h1),
                  regexp_replace(path, "/+$", ""),
                  when(sq === "", lit("")).otherwise(concat(lit("?"), sq))))
              }
            }
          }
        }
      }
    }

  /** The cp1252 second-byte image — what bytes 0x80–0xBF render as
    * when UTF-8 is mis-decoded as Windows-1252 (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹
    * Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ plus the Latin-1 range) — the
    * second character of every classic mojibake digraph. `\x{...}`
    * syntax parses identically in Java regex and RE2, so ONE string
    * serves both engines. */
  private[graft] val MojiSecond: String =
    "\\x{0080}-\\x{00BF}\\x{20AC}\\x{201A}\\x{0192}\\x{201E}\\x{2026}" +
      "\\x{2020}\\x{2021}\\x{02C6}\\x{2030}\\x{0160}\\x{2039}\\x{0152}" +
      "\\x{017D}\\x{2018}\\x{2019}\\x{201C}\\x{201D}\\x{2022}\\x{2013}" +
      "\\x{2014}\\x{02DC}\\x{2122}\\x{0161}\\x{203A}\\x{0153}\\x{017E}\\x{0178}"

  /** 2-char mojibake: a mis-decoded 2-byte UTF-8 lead (0xC2/0xC3 →
    * Â/Ã) followed by a second-byte image — cafÃ©, naÃ¯ve. */
  private[graft] val MojiPair: String = s"[\\x{00C2}\\x{00C3}][$MojiSecond]"

  /** 3-char mojibake: a mis-decoded 3-byte UTF-8 lead (0xE2 → â)
    * followed by two second-byte images — â€™, â€œ, â€¦. */
  private[graft] val MojiTriple: String = s"\\x{00E2}[$MojiSecond]{2}"

  /** Bare replacement characters — a decoder already gave up once. */
  private[graft] val ReplChar: String = "\\x{FFFD}"

  /** Stray control characters (C0 minus \t\n\r, plus the full C1
    * block) — binary junk or a double-decode artifact, never prose. */
  private[graft] val CtrlChar: String =
    "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{0080}-\\x{009F}]"

  /** Encoding-artifact detection (SURVEY.md §2.C60): per-doc counts of
    * the three mechanical signatures of a broken decode chain —
    * U+FFFD replacement chars, stray control chars, and cp1252
    * mojibake digraphs/trigraphs (UTF-8 bytes rendered as Latin-1/
    * cp1252: cafÃ©, donâ€™t) — the Dolma-family pre-filter that
    * catches corruposed text BEFORE it poisons shingles, hashes and
    * LM scores. Returns `(doc_id, n_repl, n_ctrl, n_moji, is_clean)`.
    *
    * Counting is length-difference after a global regexp_replace —
    * each match has a FIXED width (1/2/3 chars by class), so the
    * count is exact integer arithmetic, and the patterns are shared
    * string constants with the oracle (`\x{...}` parses identically
    * in Java regex and RE2). Scale shape: a pure codegen map stage —
    * four regexp passes per row, no UDF, no shuffle, no join; the
    * cheapest possible 100 TB gate. */
  def encodingArtifacts(df: org.apache.spark.sql.DataFrame, id: Column,
                        text: Column): org.apache.spark.sql.DataFrame = {
    val (nRepl, nCtrl, nMoji) = artifactCountCols(text)
    df.select(id.as("doc_id"),
        nRepl.as("n_repl"), nCtrl.as("n_ctrl"), nMoji.as("n_moji"))
      .withColumn("is_clean",
        col("n_repl") + col("n_ctrl") + col("n_moji") === 0L)
  }

  /** THE per-class artifact counts [[encodingArtifacts]] and the
    * column-level [[isCleanText]] gate share — ONE definition of the
    * width arithmetic. Coalesced: NULL text has no artifacts (0s,
    * clean) — a NULL boolean would make the row vanish from BOTH
    * sides of a clean/dirty filter (the piiStats audit contract). */
  private def artifactCountCols(text: Column): (Column, Column, Column) = {
    def removed(pat: String): Column = coalesce(
      (length(text) - length(regexp_replace(text, pat, ""))).cast("long"),
      lit(0L))
    (removed(ReplChar), removed(CtrlChar),
      ((removed(MojiPair) / 2) + (removed(MojiTriple) / 3)).cast("long"))
  }

  /** Column-level encoding gate: true iff the text carries zero
    * artifacts of any [[encodingArtifacts]] class. For pipeline
    * composition — a map-side when/filter with no frame API detour
    * and no join-back. */
  def isCleanText(text: Column): Column = {
    val (r, c, m) = artifactCountCols(text)
    r + c + m === 0L
  }

  /** Character-entropy quality signal (C56): per-doc Shannon entropy
    * of the character distribution — the cheap spam detector the
    * Dolma/C4 rule families use alongside the Gopher gates: repeated-
    * character runs, keyboard mash and template filler score near 0,
    * natural prose sits ~4±1 nats; threshold BOTH ways (too low =
    * degenerate, implausibly high = random bytes). Returns `(doc_id,
    * n_chars, distinct_chars, entropy_micro_sum, entropy_nats)`;
    * empty docs have no distribution and an honest NULL entropy.
    * Fixed-point discipline (the C37 recipe): each character's term
    * `−(c/n)·ln(c/n)` is rounded ONCE to integer micro-nats, so the
    * per-doc sum is exact in any order and in both engines.
    *
    * Scale shape: characters leave their doc as `(doc_id, n, ch)`
    * skinny rows into ONE partial-agg shuffle — distinct chars per doc
    * is alphabet-bounded (~10²), so map-side combine collapses the
    * explode before anything moves; the term arithmetic and final sum
    * are map-side over the counted frame. */
  def charEntropy(df: org.apache.spark.sql.DataFrame, id: Column,
                  text: Column): org.apache.spark.sql.DataFrame = {
    val cnt = df.select(id.as("doc_id"), length(text).as("n"),
        explode(split(text, "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("n"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val scored = cnt
      .select(col("doc_id"),
        round(col("c").cast("double") / col("n")
          * log(col("c").cast("double") / col("n")) * lit(-1e6))
          .cast("long").as("tm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("distinct_chars"), sum(col("tm")).as("hm"))
    df.select(id.as("doc_id"), length(text).cast("long").as("n_chars"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("distinct_chars"), lit(0L)).as("distinct_chars"),
        coalesce(col("hm"), lit(0L)).as("entropy_micro_sum"),
        // no cosmetic rounding: hm/1e6 is one deterministic double
        // division of an exact integer — bit-identical in any engine,
        // while round-to-4 sits on the HALF_UP-vs-binary boundary for
        // values like 2.70645
        when(col("hm").isNull, lit(null).cast("double"))
          .otherwise(col("hm").cast("double") / 1e6).as("entropy_nats"))
  }

  /** Per-domain corpus stats — `(domain, n_urls, n_docs)` — the
    * blocklist/allowlist planning view a domain-reputation filter
    * starts from. Scale shape: domain extraction is a codegen map
    * stage on the scan; one domain-keyed aggregation (high-cardinality
    * key) carries both the URL count and the distinct-doc count (the
    * distinct planned as partial aggs — no row ever carries text). */
  def domainStats(df: org.apache.spark.sql.DataFrame, id: Column,
                  text: Column): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"), explode(urlDomains(text)).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), count_distinct(col("doc_id")).as("n_docs"))

  // --- Gopher-style rule gate (C25) -------------------------------------
  // The published repetition-free document filter shape (Rae et al. 2021,
  // "Scaling Language Models", §A1.1.2): a conjunction of cheap
  // structural rules, each reported individually so a pipeline can tune
  // one without re-deriving the rest. Every rule below compares
  // INTEGERS (counts scaled by the rule's ratio denominator), never
  // floats — a mean-length rule written as `mean >= 4.0` would make the
  // pass/fail cut flaky at 1-ulp round boundaries across engines, while
  // `chars >= 4*tokens` is exact everywhere. Pure codegen map stage.

  /** Tokens containing at least one ASCII letter. */
  def alphaTokenCount(text: Column): Column =
    size(filter(split(text, " "), t => t.rlike("[A-Za-z]")))

  /** Distinct profile-stopwords present (en profile) — the Gopher
    * "contains ≥2 stop words" naturalness signal. */
  def distinctStopwordCount(text: Column): Column =
    size(array_intersect(
      array_distinct(split(lower(text), " ")),
      array(StopwordWords.toMap.apply("en").map(lit): _*)))

  /** The four rule MEASURES, named. Computed once per row and reused
    * by every flag — the lambda-bearing HOFs (alpha filter, stopword
    * intersect) are excluded from Catalyst subexpression elimination,
    * so inlining them into each flag would re-tokenize the document
    * per flag in the gate's corpus-wide map stage. */
  def gopherMeasures(text: Column): Seq[(String, Column)] = Seq(
    "n_tokens" -> tokenCountWs(text).cast("long"),
    "n_chars" -> length(regexp_replace(text, " ", "")).cast("long"),
    "n_alpha_tokens" -> alphaTokenCount(text).cast("long"),
    "n_stop_distinct" -> distinctStopwordCount(text).cast("long"))

  /** THE single definition of each rule predicate over measure columns
    * — shared by the flag columns AND the conjunction, so they cannot
    * drift. */
  private def gopherPredicates(m: Map[String, Column],
                               minTokens: Int, maxTokens: Int,
                               minMeanLen: Int, maxMeanLen: Int,
                               minStopwords: Int): Seq[(String, Column)] = Seq(
    "ok_word_count" -> (m("n_tokens") >= minTokens && m("n_tokens") <= maxTokens),
    // chars/tokens ∈ [minMeanLen, maxMeanLen] without the division
    "ok_mean_len" -> (m("n_chars") >= m("n_tokens") * minMeanLen &&
      m("n_chars") <= m("n_tokens") * maxMeanLen),
    "ok_alpha" -> (m("n_alpha_tokens") * 5 >= m("n_tokens") * 4),
    "ok_stopwords" -> (m("n_stop_distinct") >= minStopwords))

  /** Append the measures, flags, and `passes` to `df` in TWO select
    * stages (measures first, flags referencing the named measure
    * columns) so each HOF measure is evaluated exactly once per row —
    * the Spark mirror of the SQL side's m-CTE shape. This is the form
    * the registered queries and streaming lift use. */
  def gopherGate(df: org.apache.spark.sql.DataFrame, text: Column,
                 minTokens: Int, maxTokens: Int,
                 minMeanLen: Int, maxMeanLen: Int,
                 minStopwords: Int = 2): org.apache.spark.sql.DataFrame = {
    val m = gopherMeasures(text).map { case (n, _) => n -> col(n) }.toMap
    val flags = gopherPredicates(m, minTokens, maxTokens,
      minMeanLen, maxMeanLen, minStopwords)
    // fail fast on reserved-name collisions: an input already carrying
    // a measure name (plausible after a profiling step) would otherwise
    // make the flag stage's col("n_tokens") reference throw an
    // ambiguous-reference AnalysisException — or worse, silently read
    // the stale column
    val reserved = (m.keys ++ flags.map(_._1) ++ Seq("passes")).toSet
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"gopherGate writes reserved columns ${reserved.toSeq.sorted.mkString(", ")}; " +
        s"input already carries: ${clash.toSeq.sorted.mkString(", ")}")
    val measured = df.select(
      col("*") +: gopherMeasures(text).map { case (n, c) => c.as(n) }: _*)
    // passes is coalesced: NULL text gives NULL measures and a NULL
    // conjunction — the gate's honest answer for no-text is FALSE
    // (fails quality), not a NULL that vanishes from filter(passes)
    // AND filter(!passes) alike. Per-rule flags keep their NULLs (no
    // measurement happened); only the decision column is forced.
    measured.select(col("*") +: (flags.map { case (n, c) => c.as(n) } :+
      coalesce(flags.map(_._2).reduce(_ && _), lit(false)).as("passes")): _*)
  }

  /** Readability measures (SURVEY.md §2.C73) — Flesch reading ease
    * from three mechanical counts: whitespace words, sentence-ending
    * punctuation runs (`[.!?]+`, floored at 1 so fragment docs score
    * rather than divide by zero), and vowel-group syllable
    * approximation (`[aeiouy]+` runs per lowercased doc — the
    * standard heuristic; true hyphenation needs a dictionary, and for
    * CORPUS FILTERING the approximation's bias is uniform). Extreme
    * scores flag non-prose (lists, code, keyword stuffing) the
    * Gopher gates don't directly see.
    *
    * All three counts are exact integers; the Flesch formula
    * `206.835 − 1.015·(w/s) − 84.6·(syl/w)` is ONE fixed IEEE
    * expression over them (the B23 discipline) — no accumulation, no
    * libm, bit-identical cross-engine. A pure codegen map stage.
    * Returns (n_words, n_sentences, n_syllables, flesch) columns;
    * NULL text → NULL measures (nothing was measured).
    */
  def readability(text: Column): Seq[(String, Column)] = {
    val words = tokenCountWs(text).cast("long")
    // explicit NULL-text guard: greatest() semantics over NULL differ
    // between engines, and a "1 sentence" reading of no text is a lie
    val sents = when(text.isNotNull,
      greatest(regexp_count(text, lit("[.!?]+")), lit(1))).cast("long")
    val syls = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    val flesch = lit(206.835) -
      lit(1.015) * (words.cast("double") / sents.cast("double")) -
      lit(84.6) * (syls.cast("double") / words.cast("double"))
    Seq("n_words" -> words, "n_sentences" -> sents,
      "n_syllables" -> syls, "flesch" -> flesch)
  }

  /** Fixed-size overlapping token-window chunking (SURVEY.md §2.C68) —
    * the retrieval/embedding prep step (RAG corpora, context-bounded
    * encoders): each doc becomes ⌈n/stride⌉-ish rows of `chunkLen`
    * whitespace tokens starting every `stride` tokens (overlap =
    * chunkLen − stride), the final chunk shorter. A start is emitted
    * iff it's 0 or the PREVIOUS chunk didn't already reach the doc's
    * end — so no emitted chunk is a suffix of its predecessor and the
    * chunks still tile every token. Unlike C48 (one corpus-wide token
    * stream cut at exact boundaries, docs straddling cuts), chunks
    * here are per-doc and self-contained — the shape an embedding
    * model consumes.
    *
    * Scale shape: tokens never leave their doc — the whole operator
    * is one codegen map stage (split → sequence → filtered explode →
    * slice/array_join), zero shuffle, output O(n_tokens/stride) rows.
    * NULL text chunks to nothing (no content ⇒ no rows — the C41
    * absence-is-not-content rule).
    */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, id: Column,
                    text: Column, chunkLen: Int, stride: Int):
      org.apache.spark.sql.DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen=$chunkLen], got $stride")
    val toks = split(text, " ")
    val n = size(toks)
    df.filter(text.isNotNull)
      .select(id.as("doc_id"), toks.as("__toks"), n.as("__n"),
        explode(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride))).as("__s"))
      // keep a start iff the previous chunk stopped short of the end
      .filter(col("__s") === 0 || col("__s") - stride + chunkLen < col("__n"))
      .select(col("doc_id"),
        (col("__s") / stride).cast("long").as("chunk_id"),
        col("__s").cast("long").as("start_tok"),
        least(lit(chunkLen), col("__n") - col("__s")).cast("long").as("chunk_tokens"),
        array_join(slice(col("__toks"), col("__s") + 1, lit(chunkLen)), " ").as("chunk"))
  }

  /** Per-rule flags + the conjunction as loose (name, Column) pairs —
    * the predicate definitions are [[gopherPredicates]], applied to
    * inline measures. Convenient for unit tests and one-off column
    * use; prefer [[gopherGate]] in corpus-wide pipelines, where the
    * two-stage select evaluates each HOF measure once. Thresholds are
    * parameters so the query layer documents its cut lines (Gopher's
    * published stopword minimum is 2; a synthetic or domain-restricted
    * corpus may need 1 — the registered queries do). */
  def gopherRules(text: Column, minTokens: Int, maxTokens: Int,
                  minMeanLen: Int, maxMeanLen: Int,
                  minStopwords: Int = 2): Seq[(String, Column)] = {
    val m = gopherMeasures(text).toMap
    val flags = gopherPredicates(m, minTokens, maxTokens,
      minMeanLen, maxMeanLen, minStopwords)
    Seq(
      "n_tokens" -> m("n_tokens"),
      "n_alpha_tokens" -> m("n_alpha_tokens"),
      "n_stop_distinct" -> m("n_stop_distinct")) ++
      // passes coalesced like gopherGate's: NULL text FAILS the gate,
      // it doesn't vanish from both filter sides as a NULL boolean
      flags :+ ("passes" -> coalesce(flags.map(_._2).reduce(_ && _), lit(false)))
  }
}
