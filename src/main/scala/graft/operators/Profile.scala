package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling (SURVEY.md §2.D8) — the data-quality gate of a
  * curation pipeline: per-column row / non-null / exact-distinct
  * counts, computed in ONE aggregation pass over the table (Catalyst
  * plans the multi-countDistinct via Expand, so the table is scanned
  * once) and unpivoted to a row per column.
  *
  * The exact variant carries the DuckDB oracle; its 100 TB twin is
  * [[Profile.profileApprox]] — approx_count_distinct (HLL), one scan
  * with constant state and NO Expand multiplication, registered
  * `no_oracle` and spec-bounded against the exact frame.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    profileWith(df, columns, c => countDistinct(col(c)))

  /** [[profile]] with the 100 TB distinct counter (D8's prescribed
    * swap, now a real entry point): `approx_count_distinct` is an HLL
    * sketch — ONE scan with constant per-column state and NO Expand,
    * where the exact multi-countDistinct multiplies the shuffled rows
    * by the distinct-column count. Row and non-null counts stay exact
    * (they cost nothing extra); only `n_distinct` is approximate, with
    * standard error `rsd` (the q16b discipline: registered
    * `no_oracle`, spec-bounded against the exact twin). */
  def profileApprox(df: DataFrame, columns: Seq[String],
                    rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    profileWith(df, columns, c => approx_count_distinct(col(c), rsd))
  }

  private def profileWith(df: DataFrame, columns: Seq[String],
                          distinctAgg: String => Column): DataFrame = {
    // names are spliced into a stack() expression — reject anything
    // that isn't a plain identifier rather than mis-parse it
    columns.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile: column name '$c' is not a plain identifier"))
    require(columns.nonEmpty, "profile: need at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      columns.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        distinctAgg(c).as(s"nd_$c")))
    val stacked = columns
      .map(c => s"'$c', n_rows, nn_$c, nd_$c")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${columns.size}, $stacked) AS " +
        "(column_name, n_rows, n_nonnull, n_distinct)"))
  }

  private val EventCols = Seq("event_id", "user_id", "event_type", "value", "props")

  val qProfile = Q(
    "qprofile_table",
    (s, dir) => {
      Profile.profile(Tables(s, dir).events, EventCols)
        .orderBy(col("column_name"))
    },
    Some {
      val selects = EventCols.map(c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS n_distinct
         FROM events""")
      selects.mkString("", "\n      UNION ALL\n      ",
        "\n      ORDER BY column_name")
    })

  /** D8b: the approx profile as a registered entry point. `no_oracle`
    * by construction (HLL is approximate); the spec bounds every
    * per-column estimate against the exact twin and pins the plan
    * shape (no Expand — the entire point of the swap). */
  val qProfileApprox = Q(
    "qprofile_table_approx",
    (s, dir) => {
      Profile.profileApprox(Tables(s, dir).events, EventCols)
        .orderBy(col("column_name"))
    },
    None)

  /** Per-source corpus summary — the mixture-planning view a curation
    * run starts from (how much of each domain, how long, how diverse).
    * One grouped aggregation with map-side partials; `source`
    * cardinality scales with the corpus (domains), so no low-card
    * funnel. All aggregates are integer-exact long sums; the mean
    * rides along as a deterministic long/long division, rounded. */
  val qProfileSources = Q(
    "qprofile_sources",
    (s, dir) => {
      Tables(s, dir).documents
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long"))
            .as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("mean_tokens",
          round(col("total_tokens").cast("double") / col("n_docs"), 4))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*), 4)
          AS mean_tokens
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** Power-of-two histogram boundaries shared by the Spark when-chain
    * and the SQL CASE so the two can't drift: bucket b covers
    * [2^b, 2^(b+1)), bucket 0 additionally catches n < 1. Plenty for
    * token counts (2^20 ≈ 1M tokens/doc). */
  private val LenBuckets = 0 to 20

  /** Sequence-length distribution (D11): docs and tokens per
    * power-of-two token-count bucket — the view consulted before
    * choosing a packing budget (C17) or length cuts (C25): where the
    * mass sits, how heavy the tail is. The bucket boundary is an
    * INTEGER comparison chain (never floor(log2(n)) — a libm log2 at
    * an exact power of two is a cross-engine coin flip); one grouped
    * aggregation with map-side partials over a map-only bucket
    * expression. */
  def lengthHistogram(df: DataFrame, id: Column, sizeCol: Column): DataFrame = {
    val n = sizeCol.cast("long")
    val bucket = LenBuckets.reverse.tail.foldLeft(lit(LenBuckets.last)) {
      case (acc, b) => when(n < (1L << (b + 1)), lit(b)).otherwise(acc)
    }
    df.select(id.as("doc_id"), n.as("n"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_docs"), col("n_tokens"), col("min_tokens"), col("max_tokens"))
  }

  val qLengths = Q(
    "qprofile_lengths",
    (s, dir) =>
      Profile.lengthHistogram(
          Tables(s, dir).documents, col("doc_id"),
          graft.functions.TextFunctions.tokenCountWs(col("text")))
        .orderBy(col("bucket")),
    Some {
      // ascending: a SQL CASE matches top-down, so the tightest bound
      // must come first (the Spark fold nests to the same priority)
      val cases = LenBuckets.dropRight(1)
        .map(b => s"WHEN n < ${1L << (b + 1)} THEN $b")
        .mkString("\n               ")
      s"""
      WITH sized AS (SELECT doc_id,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS n
             FROM documents),
      b AS (SELECT doc_id, n,
              CASE $cases
               ELSE ${LenBuckets.last} END AS bucket
            FROM sized)
      SELECT CAST(bucket AS BIGINT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n) AS BIGINT) AS n_tokens,
        CAST(MIN(n) AS BIGINT) AS min_tokens,
        CAST(MAX(n) AS BIGINT) AS max_tokens
      FROM b GROUP BY bucket
      ORDER BY bucket"""
    })

  /** Join-key skew profile (SURVEY.md §2.C119) — the measurement that
    * decides the skew strategy BEFORE a 100 TB join or aggregation
    * melts one task: per-key multiplicities, log₂-bucketed (the C104
    * binary-length integer — no libm log2 at a power-of-two boundary).
    * One row per occupied bucket: `(bucket, lo, hi, n_keys, n_rows,
    * max_cnt)` — the tail bucket's `max_cnt` against an even
    * per-partition row target IS the salt factor (C19/C21's knob), a
    * bulging tail bucket says salt-or-AQE-skew-join, a flat profile
    * says plain hash join is fine. NULL keys are counted as a key
    * (they hash to one partition like any other value — exactly the
    * skew this audit exists to catch).
    *
    * Scale shape: one key-keyed count with map-side partials, then a
    * ≤64-row bucket aggregate — nothing but (key, count) pairs ever
    * shuffle, and the output is bounded by 64 rows regardless of
    * corpus size. */
  def keySkew(df: DataFrame, key: Column): DataFrame = {
    df.select(key.as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .select((length(bin(col("cnt"))) - 1).cast("long").as("bucket"), col("cnt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      .select(col("bucket"),
        expr("CAST(1 AS BIGINT) << bucket").as("lo"),
        (expr("CAST(1 AS BIGINT) << (bucket + 1)") - 1).as("hi"),
        col("n_keys"), col("n_rows"), col("max_cnt"))
  }

  /** Referential-integrity profile (SURVEY.md §2.C65): one summary
    * row auditing an id relationship between two tables — orphans on
    * each side, matched ids, duplicate ids per side, raw row counts.
    * The check every multi-table corpus needs between pipeline stages
    * (every document should have exactly one embedding; an orphan
    * embedding is wasted compute, a duplicate id poisons every
    * id-keyed join downstream).
    *
    * Scale shape: each side collapses to `(id, count)` with map-side
    * partials BEFORE the join — payloads (text, vectors) never move —
    * then one id-keyed full-outer join and a single global aggregate
    * whose partials combine map-side. ~16 bytes per distinct id of
    * shuffle, regardless of table width. */
  def integrityProfile(left: DataFrame, leftId: Column,
      right: DataFrame, rightId: Column): DataFrame = {
    val l = left.select(leftId.as("id")).groupBy(col("id"))
      .agg(count(lit(1)).as("nl"))
    val r = right.select(rightId.as("id")).groupBy(col("id"))
      .agg(count(lit(1)).as("nr"))
    // every sum is coalesced: on two EMPTY inputs the join has zero
    // rows and a bare sum() would report NULL, not 0 — a downstream
    // gate like `left_orphans = 0` must not silently null out
    l.join(r, Seq("id"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("nl"), lit(0L))), lit(0L)).as("left_rows"),
        coalesce(sum(coalesce(col("nr"), lit(0L))), lit(0L)).as("right_rows"),
        coalesce(sum(when(col("nl").isNotNull && col("nr").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("matched_ids"),
        coalesce(sum(when(col("nr").isNull, 1L).otherwise(0L)), lit(0L))
          .as("left_orphans"),
        coalesce(sum(when(col("nl").isNull, 1L).otherwise(0L)), lit(0L))
          .as("right_orphans"),
        coalesce(sum(when(col("nl") > 1, 1L).otherwise(0L)), lit(0L))
          .as("left_dup_ids"),
        coalesce(sum(when(col("nr") > 1, 1L).otherwise(0L)), lit(0L))
          .as("right_dup_ids"))
  }

  /** Categorical drift between two corpus versions (SURVEY.md §2.D14)
    * — per-category counts, shares and the KL(new‖old) contribution,
    * the audit run between crawls BEFORE retraining on a shifted
    * mixture (a source whose share silently doubled skews every
    * mixture plan downstream; C63 answers "which DOCS changed", this
    * answers "did the DISTRIBUTION move"). Categories present on one
    * side only are flagged (`appeared`/`vanished`) instead of fed to
    * the logarithm — KL is undefined there, and an honest flag beats
    * a sentinel infinity.
    *
    * Exactness: counts and totals are exact longs; the KL term
    * `p_new · ln(p_new/p_old)` evaluates the ratio as
    * `(n_new·tot_old)/(n_old·tot_new)` in ONE fixed IEEE tree and
    * rounds ONCE to integer micro-nats (the C37 discipline) — summing
    * the column gives the corpus KL exactly, in any order, in both
    * engines. Scale shape: two partial-agg scans to ~10²-row category
    * frames, a full-outer join of those frames, 1-row totals broadcast
    * back — the corpus never shuffles. */
  def categoryDrift(old: DataFrame, neu: DataFrame, key: Column): DataFrame = {
    val o = old.select(key.as("cat")).groupBy(col("cat"))
      .agg(count(lit(1)).as("n_old"))
    val n = neu.select(key.as("cat")).groupBy(col("cat"))
      .agg(count(lit(1)).as("n_new"))
    val j = o.join(n, Seq("cat"), "full_outer")
    val tot = j.agg(
      coalesce(sum(col("n_old")), lit(0L)).as("tot_old"),
      coalesce(sum(col("n_new")), lit(0L)).as("tot_new"))
    j.crossJoin(broadcast(tot))
      .select(col("cat"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        when(col("n_old").isNull, lit("appeared"))
          .when(col("n_new").isNull, lit("vanished"))
          .otherwise(lit("common")).as("status"),
        when(col("n_old").isNotNull && col("n_new").isNotNull,
          round((col("n_new").cast("double") / col("tot_new").cast("double")) *
            log((col("n_new").cast("double") * col("tot_old").cast("double")) /
              (col("n_old").cast("double") * col("tot_new").cast("double"))) * 1e6)
            .cast("long")).as("kl_term_micro"))
  }

  val qDrift = Q(
    "qprofile_drift",
    (s, dir) => {
      val d = Tables(s, dir).documents
      // derived versions with all three statuses non-vacuous: src0
      // appears (absent from old), src1 vanishes, src2 halves its share
      val old = d.filter(col("source") =!= "src0")
      val neu = d.filter(col("source") =!= "src1" &&
        !(col("source") === "src2" && pmod(col("doc_id"), lit(2)) === 0))
      categoryDrift(old, neu, col("source")).orderBy(col("cat"))
    },
    Some("""
      WITH o AS (SELECT source AS cat, CAST(COUNT(*) AS BIGINT) AS n_old
                 FROM documents WHERE source <> 'src0' GROUP BY 1),
      n AS (SELECT source AS cat, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM documents
            WHERE source <> 'src1' AND NOT (source = 'src2' AND doc_id % 2 = 0)
            GROUP BY 1),
      j AS (SELECT COALESCE(o.cat, n.cat) AS cat, o.n_old, n.n_new
            FROM o FULL OUTER JOIN n ON o.cat = n.cat),
      t AS (SELECT COALESCE(SUM(n_old), 0) AS tot_old,
                   COALESCE(SUM(n_new), 0) AS tot_new FROM j)
      SELECT cat,
        COALESCE(n_old, 0) AS n_old,
        COALESCE(n_new, 0) AS n_new,
        CASE WHEN n_old IS NULL THEN 'appeared'
             WHEN n_new IS NULL THEN 'vanished'
             ELSE 'common' END AS status,
        CASE WHEN n_old IS NOT NULL AND n_new IS NOT NULL THEN
          CAST(ROUND((CAST(n_new AS DOUBLE) / CAST(tot_new AS DOUBLE)) *
            ln((CAST(n_new AS DOUBLE) * CAST(tot_old AS DOUBLE)) /
               (CAST(n_old AS DOUBLE) * CAST(tot_new AS DOUBLE))) * 1000000) AS BIGINT)
        END AS kl_term_micro
      FROM j CROSS JOIN t
      ORDER BY cat"""))

  /** Cross-source content-overlap matrix (SURVEY.md §2.C77) — for
    * every pair of sources sharing content, the count of word-n-grams
    * they have in common and the Jaccard over their distinct-gram
    * sets. This is the mirror-detection / mixture-planning audit C63
    * and D14 don't cover: C63 diffs VERSIONS of one corpus, D14
    * compares category SHARES — this answers "which sources are
    * copying each other's text" (mirrors, syndication, scraped
    * re-posts), which decides whether two sources deserve independent
    * mixture weight at all. Grams come from [[Dedup.wordShingles]] —
    * the ONE engine-wide shingling definition (C22's discipline).
    *
    * Scale shape: the corpus collapses map-side to distinct
    * `(source, xxhash64(gram))` rows — text never shuffles, each row
    * is ~source-bytes + 8. Ubiquitous grams (boilerplate present in
    * more than `maxSources` sources) are dropped by a grouped count +
    * left_anti BEFORE the pair join (the round-9 cap discipline — no
    * WindowExec buffering), bounding the self-join's per-gram fan-out
    * at maxSources²/2 pair rows. The pair join keys on the uniform
    * gram hash; the totals join keys on source (AQE broadcasts it
    * when the source list is small). Hash collisions conflate two
    * grams with odds ~1e-11 at 10⁷ grams — the C22 trade; the
    * string-keyed oracle stays valid because counts, not hashes, are
    * the output. Pairs sharing nothing don't appear (an absent row IS
    * the signal "independent sources"). */
  def sourceOverlap(df: DataFrame, source: Column, text: Column,
                    n: Int = 8, maxSources: Int = 256): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(maxSources >= 2, s"maxSources must allow a pair, got $maxSources")
    // persisted: the tokenize+hash+distinct pass (a full corpus scan
    // plus a shuffle) serves the cap count AND, via kept, the totals
    // agg and BOTH sides of the pair self-join — unpersisted it would
    // execute four times (the fps/sh/sigs discipline of the sibling
    // pair operators)
    val sg = df
      .select(source.as("src"), explode(Dedup.wordShingles(text, n)).as("gram"))
      .select(col("src"), xxhash64(col("gram")).as("gh"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sg is distinct (src, gh), so count(*) per gh == distinct sources
    val overCap = sg.groupBy(col("gh")).count()
      .filter(col("count") > maxSources).select(col("gh"))
    val kept = sg.join(overCap, Seq("gh"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = kept.groupBy(col("src")).agg(count(lit(1)).as("n_grams"))
    val pairs = kept.toDF("gh", "src_a")
      .join(kept.toDF("gh", "src_b"), "gh")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    pairs
      .join(totals.toDF("src_a", "n_grams_a"), "src_a")
      .join(totals.toDF("src_b", "n_grams_b"), "src_b")
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        col("shared_grams"), col("n_grams_a"), col("n_grams_b"),
        round(col("shared_grams").cast("double") /
          (col("n_grams_a") + col("n_grams_b") - col("shared_grams"))
            .cast("double"), 6).as("jaccard"))
  }

  val qOverlap = Q(
    "qprofile_overlap",
    (s, dir) =>
      Profile.sourceOverlap(Tables(s, dir).documents,
          col("source"), col("text"))
        .orderBy(col("source_a"), col("source_b")),
    Some("""
      WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      grams AS (
        SELECT DISTINCT source,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 7)) AS u(i)
        WHERE len(t) >= 8),
      keep AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 256),
      sg AS (SELECT g.source, g.gram FROM grams g JOIN keep USING (gram)),
      tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM sg GROUP BY 1),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
              CAST(COUNT(*) AS BIGINT) AS shared_grams
            FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
            GROUP BY 1, 2)
      SELECT p.source_a, p.source_b, p.shared_grams,
        ta.n_grams AS n_grams_a, tb.n_grams AS n_grams_b,
        ROUND(CAST(p.shared_grams AS DOUBLE) /
          CAST(ta.n_grams + tb.n_grams - p.shared_grams AS DOUBLE), 6) AS jaccard
      FROM p
      JOIN tot ta ON ta.source = p.source_a
      JOIN tot tb ON tb.source = p.source_b
      ORDER BY source_a, source_b"""))

  val qIntegrity = Q(
    "qprofile_integrity",
    (s, dir) => {
      val t = Tables(s, dir)
      Profile.integrityProfile(t.documents, col("doc_id"),
        t.embeddings, col("vec_id"))
    },
    Some("""
      WITH l AS (SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS nl
                 FROM documents GROUP BY 1),
      r AS (SELECT vec_id AS id, CAST(COUNT(*) AS BIGINT) AS nr
            FROM embeddings GROUP BY 1),
      j AS (SELECT nl, nr FROM l FULL OUTER JOIN r ON l.id = r.id)
      SELECT
        CAST(SUM(COALESCE(nl, 0)) AS BIGINT) AS left_rows,
        CAST(SUM(COALESCE(nr, 0)) AS BIGINT) AS right_rows,
        CAST(SUM(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched_ids,
        CAST(SUM(CASE WHEN nr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_orphans,
        CAST(SUM(CASE WHEN nl IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_orphans,
        CAST(SUM(CASE WHEN nl > 1 THEN 1 ELSE 0 END) AS BIGINT) AS left_dup_ids,
        CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS right_dup_ids
      FROM j"""))

  /** Robust per-group outlier screen (SURVEY.md §2.C91) — the Hampel
    * filter over an integer metric: per group, the EXACT lower median
    * and MAD (median absolute deviation), and per row an `outlier`
    * flag at `|x − med|·kDen > kNum·mad`. Mean/stddev outlier cuts are
    * circular (the outliers they hunt inflate the very moments that
    * define them — one 10⁹-char doc shifts a source's mean cut by
    * orders of magnitude); median/MAD have a 50% breakdown point, the
    * standard robust screen (Hampel 1974; Leys et al. 2013).
    *
    * Exactness: the lower median is the ⌈n/2⌉-th order statistic — an
    * integer, found by a running-frame rank (never a whole-partition
    * buffer) against a grouped count joined back; MAD repeats the same
    * rank on `|x − med|`. The flag is a cross-multiplied integer
    * comparison. Nothing here rounds, so engine parity is exact.
    *
    * Scale shape: two rank-windows over the corpus partitioned by
    * group — each is a per-group SORT, the honest cost of an exact
    * order statistic (spills, never buffers: row_number's frame is
    * running). The count and the two per-group medians broadcast back
    * (group cardinality = sources, small). The 100 TB twin is
    * [[robustOutliersApprox]] — both medians from one-pass mergeable
    * sketches, no per-group sorts. NULL metrics can't be judged:
    * excluded from the stats, flagged false, carried with NULL
    * deviation. Cache lifetime: the returned frame reads the two
    * persisted rank inputs (base, dev) — the CALLER owns those
    * caches; unpersisting here would re-sort the corpus when the
    * result materializes (the pplBuckets contract). */
  def robustOutliers(df: DataFrame, id: Column, group: Column, value: Column,
                     kNum: Long = 9, kDen: Long = 2): DataFrame = {
    require(kNum > 0 && kDen > 0, s"need positive k ratio, got $kNum/$kDen")
    val base = df.select(id.as("doc_id"), group.as("source"),
        value.cast("long").as("x"))
      .filter(col("x").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = base.groupBy(col("source")).agg(count(lit(1)).as("n"))
    def lowerMedian(in: DataFrame, v: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col(v).asc, col("doc_id").asc)
      in.withColumn("__rn", row_number().over(w))
        .join(broadcast(cnt), "source")
        .filter(col("__rn") === expr("(n + 1) div 2"))
        .select(col("source"), col(v).as(out))
    }
    val med = lowerMedian(base, "x", "med")
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs(col("x") - col("med")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = lowerMedian(dev, "dev", "mad")
    val stats = med.join(mad, "source")
    df.select(id.as("doc_id"), group.as("source"),
        value.cast("long").as("x"))
      .join(broadcast(stats), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("x"),
        col("med"), col("mad"),
        abs(col("x") - col("med")).as("dev"),
        coalesce(
          abs(col("x") - col("med")) * lit(kDen) > lit(kNum) * col("mad"),
          lit(false)).as("outlier"))
  }

  /** [[robustOutliers]] with SKETCHED medians (C91's prescribed
    * 100 TB path, now a real entry point — the C70b/C66b discipline):
    * same contract and output columns, but the per-group median and
    * MAD come from `approx_percentile(·, 0.5, accuracy)` — Spark's
    * Greenwald-Khanna summaries, mergeable map-side partials with
    * constant state — so the two per-group SORTS of the exact variant
    * become two sketch aggregation passes: at 100 TB an exact order
    * statistic per (source, metric) is a corpus sort per statistic,
    * which is exactly the cost this swap deletes.
    *
    * What stays exact: the returned med/mad are ACTUAL corpus values
    * (GK returns elements, never interpolates), so `dev` and the
    * cross-multiplied `outlier` compare are still exact integers —
    * only the RANK of the chosen cut values is approximate, bounded
    * by `accuracy` (exact when a group's row count stays under it).
    * Registered `no_oracle` by construction; the spec pins the
    * rank-ECDF bound and exact-fixture equality with [[robustOutliers]]
    * up to the even-n median convention.
    *
    * Scale shape: three column-pruned scans of (id, group, x) — one
    * per sketch pass plus the flag projection — zero sorts, zero
    * windows; the ≤|groups|-row stats frames broadcast back. */
  def robustOutliersApprox(df: DataFrame, id: Column, group: Column,
                           value: Column, kNum: Long = 9, kDen: Long = 2,
                           accuracy: Int = 100000): DataFrame = {
    require(kNum > 0 && kDen > 0, s"need positive k ratio, got $kNum/$kDen")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val base = df.select(id.as("doc_id"), group.as("source"),
        value.cast("long").as("x"))
      .filter(col("x").isNotNull)
    val med = base.groupBy(col("source"))
      .agg(percentile_approx(col("x"), lit(0.5), lit(accuracy)).as("med"))
    val mad = base.join(broadcast(med), "source")
      .select(col("source"), abs(col("x") - col("med")).as("dev"))
      .groupBy(col("source"))
      .agg(percentile_approx(col("dev"), lit(0.5), lit(accuracy)).as("mad"))
    val stats = med.join(mad, "source")
    df.select(id.as("doc_id"), group.as("source"),
        value.cast("long").as("x"))
      .join(broadcast(stats), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("x"),
        col("med"), col("mad"),
        abs(col("x") - col("med")).as("dev"),
        coalesce(
          abs(col("x") - col("med")) * lit(kDen) > lit(kNum) * col("mad"),
          lit(false)).as("outlier"))
  }

  /** C91b registered: the approx screen at the same 2·MAD cut as C91.
    * `no_oracle` by construction (sketch-selected cuts); the spec pins
    * it to the exact twin on fixtures where the sketch is exact. */
  val qOutliersApprox = Q(
    "qprofile_outliers_q",
    (s, dir) =>
      Profile.robustOutliersApprox(Tables(s, dir).documents,
          col("doc_id"), col("source"), col("n_chars"), kNum = 2, kDen = 1)
        .orderBy(col("doc_id")),
    None)

  /** C91 registered at kNum=2/kDen=1 (2·MAD): the synthetic lengths
    * are near-uniform (MAD ≈ 100 per source), so the Hampel default
    * 4.5·MAD flags nothing — 2·MAD flags a real minority (51/500),
    * keeping both flag branches non-vacuous. All-integer: exact. */
  val qOutliers = Q(
    "qprofile_outliers",
    (s, dir) =>
      Profile.robustOutliers(Tables(s, dir).documents,
          col("doc_id"), col("source"), col("n_chars"), kNum = 2, kDen = 1)
        .orderBy(col("doc_id")),
    Some("""
      WITH b AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
                 FROM documents WHERE n_chars IS NOT NULL),
      cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY source),
      r1 AS (SELECT b.*, ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS rn
             FROM b),
      med AS (SELECT r1.source, r1.x AS med
              FROM r1 JOIN cnt USING (source) WHERE rn = (n + 1) // 2),
      d AS (SELECT b.doc_id, b.source, b.x, abs(b.x - med.med) AS dev
            FROM b JOIN med USING (source)),
      r2 AS (SELECT d.*, ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn
             FROM d),
      mad AS (SELECT r2.source, r2.dev AS mad
              FROM r2 JOIN cnt USING (source) WHERE rn = (n + 1) // 2)
      SELECT doc.doc_id, doc.source, CAST(doc.n_chars AS BIGINT) AS x,
             med.med, mad.mad,
             abs(CAST(doc.n_chars AS BIGINT) - med.med) AS dev,
             COALESCE(abs(CAST(doc.n_chars AS BIGINT) - med.med) * 1 > 2 * mad.mad,
                      FALSE) AS outlier
      FROM documents doc
      LEFT JOIN med ON med.source = doc.source
      LEFT JOIN mad ON mad.source = doc.source
      ORDER BY doc.doc_id"""))

  /** Key-skew profile (C119) over lineitem's join key: l_orderkey
    * multiplicity is 1-7 (TPC-H line counts), so the fixture occupies
    * buckets 0-2 with a known total — plus a NULL-key path exercised
    * in the spec. Oracle mirrors the binary-length bucket (DuckDB
    * `bin` is leading-zero-free like Spark's). */
  val qKeySkew = Q(
    "qprofile_skew",
    (s, dir) =>
      Profile.keySkew(Tables(s, dir).lineitem, col("l_orderkey"))
        .orderBy(col("bucket")),
    Some("""
      WITH c AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM lineitem GROUP BY l_orderkey),
      b AS (SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket, cnt FROM c)
      SELECT bucket,
        CAST(1 AS BIGINT) << bucket AS lo,
        (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi,
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(SUM(cnt) AS BIGINT) AS n_rows,
        MAX(cnt) AS max_cnt
      FROM b GROUP BY bucket
      ORDER BY bucket"""))

  /** Inter-rater agreement (Cohen's kappa) between two boolean raters
    * over the same corpus (C120) — the calibration check a curation
    * pipeline runs before swapping one quality gate for another
    * (rule-based vs learned, old vs retrained model): observed
    * agreement alone is inflated by marginal prevalence, kappa
    * corrects for chance.
    *
    * Scale shape: ONE aggregation pass (map-side partials, 5 long
    * counters per partition — a single ~40-byte row shuffles
    * regardless of corpus size); the kappa arithmetic runs on the
    * driver-side 1-row frame. NULL rater verdicts count as `false`
    * (an un-ratable doc is a rejection, mirroring `gopherGate`'s
    * coalesced `passes`).
    *
    * Exactness: the confusion counts are exact longs; po/pe/kappa are
    * IEEE-double divisions of those longs, identical in any engine.
    * pe = 1 (both raters constant and equal) makes kappa undefined →
    * NULL, not a 0/0 NaN. */
  def raterAgreement(df: DataFrame, a: Column, b: Column): DataFrame = {
    val ra = coalesce(a, lit(false))
    val rb = coalesce(b, lit(false))
    val c = df.agg(
      count(lit(1)).as("n"),
      sum(when(ra && rb, lit(1L)).otherwise(lit(0L))).as("n_both"),
      sum(when(ra && !rb, lit(1L)).otherwise(lit(0L))).as("n_a_only"),
      sum(when(!ra && rb, lit(1L)).otherwise(lit(0L))).as("n_b_only"),
      sum(when(!ra && !rb, lit(1L)).otherwise(lit(0L))).as("n_neither"))
    val po = (col("n_both") + col("n_neither")).cast("double") / col("n")
    val pe = ((col("n_both") + col("n_a_only")) * (col("n_both") + col("n_b_only")) +
        (col("n_b_only") + col("n_neither")) * (col("n_a_only") + col("n_neither")))
      .cast("double") / (col("n") * col("n"))
    c.select(col("n"), col("n_both"), col("n_a_only"), col("n_b_only"),
      col("n_neither"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round(when(pe === lit(1.0), lit(null).cast("double"))
        .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** Score-bucketed reliability profile (C124) — kappa's ([[raterAgreement]])
    * per-score-band refinement: bucket a learned score into fixed-width
    * integer bands and report each band's agreement rate with a
    * reference boolean gate. This is the calibration diagram a
    * classifier swap is judged on: a well-calibrated score should show
    * the gate's pass rate RISING monotonically with the band — a flat
    * or inverted band says the score does not track the quality the
    * gate measures, no matter how good the global kappa looks.
    *
    * Buckets are FLOOR division implemented with pmod (score −
    * pmod(score, width)) / width — exact for negative scores in any
    * engine (`/` truncation and `%` sign conventions differ across
    * engines; pmod-floor does not). One map stage + one grouped agg
    * on the band key (cardinality = score range / width, corpus-size
    * independent); pass_rate is an IEEE division of exact longs. */
  def reliability(df: DataFrame, score: Column, flag: Column,
                  width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val f = coalesce(flag, lit(false))
    val bucket = ((score - pmod(score, lit(width))) / lit(width)).cast("long")
    df.select(bucket.as("bucket"), f.as("f"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("f"), lit(1L)).otherwise(lit(0L))).as("n_pass"))
      .select(col("bucket"),
        (col("bucket") * width).as("lo"),
        (col("bucket") * width + (width - 1)).as("hi"),
        col("n"), col("n_pass"),
        round(col("n_pass").cast("double") / col("n"), 6).as("pass_rate"))
  }

  /** C120 registered over the two raters the suite already proves
    * individually: the Gopher structural gate (qtext_gopher's exact
    * settings) vs the hashed-linear classifier's keep verdict
    * (qtext_classifier's weights). The oracle composes both proven
    * oracle fragments — a disagreement isolates to the kappa stage,
    * never the raters. */
  val qKappa = Q(
    "qprofile_kappa",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      import graft.functions.{TextFunctions, TextQueries}
      val gated = TextFunctions.gopherGate(
        Tables(s, dir).documents.select(col("doc_id"), col("text")),
        col("text"),
        minTokens = 50, maxTokens = 100000, minMeanLen = 4, maxMeanLen = 10,
        minStopwords = 1)
      // NULL text: gate says false (coalesced `passes`); the
      // classifier's verdict is forced false to match — an un-ratable
      // doc must not read as "keep" on either side
      val rated = gated.select(
        col("passes").as("ra"),
        (col("text").isNotNull &&
          TextFunctions.hashedLinearScore(col("text"), TextQueries.demoWeights,
            nBuckets = 512L) >= lit(0L)).as("rb"))
      Profile.raterAgreement(rated, col("ra"), col("rb"))
    },
    Some {
      import graft.functions.TextQueries.{GopherMCte, GopherPassSql}
      s"""
      WITH $GopherMCte,
      ga AS (SELECT doc_id, COALESCE($GopherPassSql, FALSE) AS ra FROM m),
      toks AS (SELECT doc_id, u.t AS t
               FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
               WHERE u.t <> ''),
      ${graft.Q.sqlutil.fnvSignedCtes("c", "t", Seq("doc_id"), "toks")},
      w AS (SELECT doc_id,
              ((((sb % 512) + 512) % 512) * 2654435761) % 2001 - 1000 AS wt
            FROM cg),
      sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score
             FROM w GROUP BY doc_id),
      gb AS (SELECT d.doc_id,
               (d.text IS NOT NULL AND COALESCE(sc.score, 0) >= 0) AS rb
             FROM documents d LEFT JOIN sc USING (doc_id)),
      j AS (SELECT ga.ra, gb.rb FROM ga JOIN gb USING (doc_id)),
      cts AS (SELECT
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
          CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
          CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
          CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        FROM j),
      k AS (SELECT *,
          CAST(n_both + n_neither AS DOUBLE) / n AS po_raw,
          CAST((n_both + n_a_only) * (n_both + n_b_only)
             + (n_b_only + n_neither) * (n_a_only + n_neither) AS DOUBLE)
            / (n * n) AS pe_raw
        FROM cts)
      SELECT n, n_both, n_a_only, n_b_only, n_neither,
        ROUND(po_raw, 6) AS po, ROUND(pe_raw, 6) AS pe,
        ROUND(CASE WHEN pe_raw = 1 THEN NULL
              ELSE (po_raw - pe_raw) / (1 - pe_raw) END, 6) AS kappa
      FROM k"""
    })

  /** C124 registered over the same two raters as qprofile_kappa
    * (classifier score vs Gopher gate), width 200 — the score's
    * ±1000-per-token range occupies a handful of bands on this
    * corpus, each with both verdicts represented. NULL-text docs
    * score 0 (the qtext_classifier LEFT-JOIN coalesce) and fail the
    * gate, mirrored on both sides. */
  val qReliability = Q(
    "qprofile_reliability",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      import graft.functions.{TextFunctions, TextQueries}
      val gated = TextFunctions.gopherGate(
        Tables(s, dir).documents.select(col("doc_id"), col("text")),
        col("text"),
        minTokens = 50, maxTokens = 100000, minMeanLen = 4, maxMeanLen = 10,
        minStopwords = 1)
      val scored = gated.select(
        coalesce(TextFunctions.hashedLinearScore(col("text"),
          TextQueries.demoWeights, nBuckets = 512L), lit(0L)).as("score"),
        col("passes"))
      Profile.reliability(scored, col("score"), col("passes"), width = 200L)
        .orderBy(col("bucket"))
    },
    Some {
      import graft.functions.TextQueries.{GopherMCte, GopherPassSql}
      s"""
      WITH $GopherMCte,
      ga AS (SELECT doc_id, COALESCE($GopherPassSql, FALSE) AS f FROM m),
      toks AS (SELECT doc_id, u.t AS t
               FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
               WHERE u.t <> ''),
      ${graft.Q.sqlutil.fnvSignedCtes("c", "t", Seq("doc_id"), "toks")},
      w AS (SELECT doc_id,
              ((((sb % 512) + 512) % 512) * 2654435761) % 2001 - 1000 AS wt
            FROM cg),
      sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score
             FROM w GROUP BY doc_id),
      j AS (SELECT COALESCE(sc.score, 0) AS score, ga.f
            FROM documents d
            LEFT JOIN sc ON sc.doc_id = d.doc_id
            JOIN ga ON ga.doc_id = d.doc_id),
      b AS (SELECT (score - ((score % 200) + 200) % 200) // 200 AS bucket, f
            FROM j),
      agg AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
              FROM b GROUP BY bucket)
      SELECT bucket, bucket * 200 AS lo, bucket * 200 + 199 AS hi,
             n, n_pass, ROUND(CAST(n_pass AS DOUBLE) / n, 6) AS pass_rate
      FROM agg
      ORDER BY bucket"""
    })

  /** Materialized HLL sketches per fine-grained key (D16) — the
    * sketch-reuse OLAP trick: build the expensive distinct-state ONCE
    * at the finest grain you'll ever roll up from, persist it as a
    * table of (keys…, sketch) BYTES, and answer every coarser
    * distinct-count question by MERGING sketches instead of
    * re-scanning the corpus. At 100 TB "distinct users per X" is a
    * full-scan question each time without this, and an O(groups ×
    * sketch-bytes) question with it. A datasketches HLL union preserves the sketch
    * family's error bounds (NOT bit-equality with the direct coarse
    * sketch — low-cardinality sketches union out of sparse mode along
    * a different path), so the rollup answers carry the same ±1.6%/
    * √2^lgK guarantee the rescan would have bought (spec pins merged
    * AND direct to the same truth). */
  def hllSketches(df: DataFrame, keys: Seq[Column], value: Column,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keys: _*).agg(hll_sketch_agg(value, lgK).as("sketch"))

  /** Roll [[hllSketches]] up to coarser keys: union the sketch bytes,
    * estimate once. No corpus access — input is the sketch table. */
  def hllRollup(sketches: DataFrame, keys: Seq[Column]): DataFrame =
    sketches.groupBy(keys: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))

  /** D16 registered: distinct users per event type, answered from
    * per-(type, day) sketches — the fine grain a daily pipeline would
    * materialize — merged up to type. Approximate ⇒ no DuckDB oracle
    * (q10b/q16b discipline); the spec pins merge-equals-direct
    * exactly and the estimate within 5% of truth. */
  val qHllRollup = Q(
    "qprofile_hll_rollup",
    (s, dir) => {
      val e = Tables(s, dir).events
        .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      val fine = hllSketches(e, Seq(col("event_type"), col("day")), col("user_id"))
      hllRollup(fine, Seq(col("event_type")))
        .select(col("event_type"),
          col("approx_distinct").cast("long").as("approx_users"))
        .orderBy(col("event_type"))
    },
    None)

  // --- C134: union-MinHash source-similarity sketch ---------------------

  /** Deterministic per-slot seeds for the source sketch — FNV of the
    * slot label, so both engines can embed the same literal values. */
  private[operators] def sketchSeeds(k: Int): Seq[Long] =
    (0 until k).map(i => graft.functions.Fnv1a64.hash(s"slot:$i".getBytes("UTF-8")))

  /** Per-source union-MinHash signature (C134) — the SCALE path next
    * to [[sourceOverlap]]'s exact pair join: each source collapses to
    * k longs (slot i = min over the source's shingle hashes of
    * `fnv_mix64(seed_i, fnv1a64(gram))`), and because min is
    * associative the signature of a UNION of corpora is the
    * elementwise min of their signatures — a daily increment folds
    * into last night's sketch table with [[mergeSourceSketches]], no
    * rescan of history. Estimated Jaccard between two sources is then
    * matching-slots/k (Broder 1997: P[min agrees] = J), answered from
    * an S×k-long frame instead of a per-gram pair join that fans out
    * quadratically on shared grams.
    *
    * Exactness: the gram hash is the engine-wide [[graft.functions.Fnv1a64]]
    * (DuckDB-replicable via the HUGEINT CTE recipe) and the slot
    * re-hash is the seeded murmur3 fmix64 finalizer of
    * [[graft.functions.Mix64]] (`graft_mix64`) — chosen over the
    * earlier single wrapped `(seed XOR h)·PRIME` multiply because that
    * mix left slot rankings CORRELATED across seeds (measured 2.5× the
    * theoretical √(J(1−J)/k) estimator variance, with pathological
    * all-slots-match pairs); the xor-shift/multiply chain decorrelates
    * them. Mod-2⁶⁴ arithmetic both engines compute bit-identically;
    * min compares signed longs in both.
    *
    * Scale shape: ONE corpus scan; no distinct (min over duplicates
    * IS min over the set — the shingle set never materializes); the
    * k mins partial-aggregate map-side, so the shuffle carries
    * |sources|·k longs, nothing gram- or corpus-sized. */
  def sourceMinhashSketches(df: DataFrame, source: Column, text: Column,
                            n: Int = 2, k: Int = 64): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(k >= 1 && k <= 512, s"k must be in [1, 512], got $k")
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    val gh = df
      .select(source.as("src"),
        explode(Dedup.wordShingles(text, n, distinct = false)).as("gram"))
      .select(col("src"), call_function("fnv1a64", col("gram")).as("h"))
    val aggs = sketchSeeds(k).zipWithIndex.map { case (sd, i) =>
      min(call_function("graft_mix64", lit(sd), col("h"))).as(s"m$i")
    }
    gh.groupBy(col("src"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("src"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Fold a new increment's sketch table into an existing one: the
    * union-sketch property (min is associative and commutative) makes
    * this ONE elementwise-min merge on a |sources|-row frame — the
    * entire daily maintenance cost of the cross-source similarity
    * matrix. New sources pass through; k must match both builds. */
  def mergeSourceSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("src"), col("sig").as("__sig_a"))
      .join(b.select(col("src"), col("sig").as("__sig_b")), Seq("src"),
        "full_outer")
      .select(col("src"),
        when(col("__sig_a").isNull, col("__sig_b"))
          .when(col("__sig_b").isNull, col("__sig_a"))
          .otherwise(zip_with(col("__sig_a"), col("__sig_b"),
            (x, y) => least(x, y))).as("sig"))

  /** Pairwise estimated Jaccard from a sketch frame: matches/k per
    * (a, b) source pair. The self-join is |sources|²-bounded — the
    * whole point: the corpus-sized gram frame never joins itself. */
  def sourceSketchSimilarity(sketches: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val a = sketches.select(col("src").as("source_a"), col("sig").as("__a"))
    val b = sketches.select(col("src").as("source_b"), col("sig").as("__b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        aggregate(zip_with(col("__a"), col("__b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, t) => acc + t).as("matches"))
      .select(col("source_a"), col("source_b"), col("matches"),
        round(col("matches").cast("double") / lit(k.toDouble), 6)
          .as("est_jaccard"))
  }

  /** C134 registered: the cross-source similarity matrix answered
    * from 64-slot union-MinHash sketches at word-bigram grain — the
    * sketch-reuse discipline of D16 applied to Jaccard: S sources
    * collapse to S·64 longs in one corpus pass, the S² compare is a
    * broadcast of that frame, and tomorrow's crawl folds in by
    * elementwise min. The oracle replays the ENTIRE sketch — FNV gram
    * hashes (the engine-wide HUGEINT recipe), the seeded fmix64 slot
    * re-hash (`graft_mix64`, hi/lo-split mod-2⁶⁴ multiplies in the
    * CTE), signed per-slot mins, and the match count — so the
    * hash-match proves the sketch arithmetic, not just the estimates'
    * neighborhood. */
  val qSourceSim = Q(
    "qprofile_source_sim",
    (s, dir) => {
      val sk = Profile.sourceMinhashSketches(Tables(s, dir).documents,
        col("source"), col("text"), n = 2, k = 64)
      Profile.sourceSketchSimilarity(sk, k = 64)
        .orderBy(col("source_a"), col("source_b"))
    },
    Some {
      val seeds = sketchSeeds(64).mkString("[", ", ", "]")
      s"""
      WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      g0 AS (
        SELECT DISTINCT source,
               array_to_string(t[CAST(i + 1 AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS gram
        FROM toks, UNNEST(range(0, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2),
      ${graft.Q.sqlutil.fnvSignedCtes("sk", "gram", Seq("source"), "g0")},
      seeds AS (SELECT unnest(range(0, 64)) AS i, unnest($seeds) AS seed),
      z0 AS (SELECT source, i,
               CASE WHEN x < 0
                    THEN CAST(x AS HUGEINT) + 18446744073709551616::HUGEINT
                    ELSE CAST(x AS HUGEINT) END AS u
             FROM (SELECT skg.source, s.i, xor(skg.sb, s.seed) AS x
                   FROM skg CROSS JOIN seeds s)),
      z1 AS (SELECT source, i,
               ((v * 3981806797::HUGEINT) % 18446744073709551616::HUGEINT
                 + ((v * 4283543511::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                 % 18446744073709551616::HUGEINT AS u
             FROM (SELECT source, i, xor(u, u // 8589934592) AS v FROM z0)),
      z2 AS (SELECT source, i,
               ((v * 444984403::HUGEINT) % 18446744073709551616::HUGEINT
                 + ((v * 3301882366::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                 % 18446744073709551616::HUGEINT AS u
             FROM (SELECT source, i, xor(u, u // 8589934592) AS v FROM z1)),
      mx AS (SELECT source, i, xor(u, u // 8589934592) AS mm FROM z2),
      sig AS (SELECT source, i,
                MIN(CAST(CASE WHEN mm >= 9223372036854775808::HUGEINT
                         THEN mm - 18446744073709551616::HUGEINT
                         ELSE mm END AS BIGINT)) AS mn
              FROM mx GROUP BY 1, 2),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
              CAST(SUM(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT) AS matches
            FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
            GROUP BY 1, 2)
      SELECT source_a, source_b, matches,
             ROUND(CAST(matches AS DOUBLE) / 64.0, 6) AS est_jaccard
      FROM p ORDER BY source_a, source_b"""
    })

  /** Per-source lexical diversity (C142) — the vocabulary-richness
    * profile next to [[sourceProfiles]]'s volume stats: type-token
    * ratio (distinct words / word occurrences — LOW means templated/
    * boilerplate-heavy text, the classic symptom of scraped listings
    * or log spam) and the hapax ratio (share of the vocabulary seen
    * exactly once — HIGH means long-tail-rich prose, low means a
    * closed vocabulary). Both are standard corpus-linguistics gates a
    * mixture designer reads per source before weighting it.
    *
    * Scale shape: one explode → (source, word)-keyed count with
    * map-side combine (the only corpus-sized shuffle, same grain as
    * tf-idf's), then a per-source agg over the type frame — output is
    * |sources| rows. Ratios are one IEEE division of exact longs,
    * rounded once. Empty-token filtering matches the engine-wide
    * whitespace convention (C8). */
  def lexicalDiversity(df: DataFrame, source: Column, text: Column): DataFrame = {
    val types = df
      .select(source.as("source"), explode(split(text, " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
    types.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6)
          .as("hapax_ratio"))
  }

  /** Cross-source duplication matrix (C146) — WHERE the near-dups
    * live: fold any dup-pair frame (simhash/minhash/CDC — the C1-C5
    * family's `(doc_a, doc_b)` output) through the doc→source map and
    * count pairs per (source_a, source_b), normalized by the number
    * of possible cross pairs (n_a·n_b off-diagonal, n·(n−1)/2 on it).
    * A hot off-diagonal cell means one source mirrors another
    * (CommonCrawl vs a curated slice — down-weight or dedup-first);
    * a hot diagonal means the source self-repeats. This is the
    * mixture-design read of the dedup graph, the per-source sibling
    * of C137's size report.
    *
    * Exactness: pair counts are exact longs; the rate is ONE pinned
    * IEEE tree (cast, multiply, divide) rounded once to 9 places,
    * mirrored by the oracle. Source pairs are canonicalized
    * least/greatest — pair direction is meaningless. Scale shape: two
    * id-keyed joins attach sources to id-pair rows (the pair frame is
    * candidate-bounded, never corpus²), one map-side-combined count
    * to a ≤|sources|²-row matrix, and the per-source sizes broadcast
    * back. */
  def crossSourceDupMatrix(pairs: DataFrame, docs: DataFrame,
                           id: Column, source: Column): DataFrame = {
    val ds = docs.select(id.as("doc_id"), source.as("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = pairs
      // the dedup-family pair contract is doc_a != doc_b; enforce it
      // here so a degenerate self-pair in a single-doc source cannot
      // make `possible` = 0 and the rate Infinity
      .filter(col("doc_a") =!= col("doc_b"))
      .join(ds.select(col("doc_id").as("doc_a"), col("src").as("sa")), "doc_a")
      .join(ds.select(col("doc_id").as("doc_b"), col("src").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val sizes = ds.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val possible =
      when(col("source_a") === col("source_b"),
        col("na").cast("double") * (col("na") - 1) / lit(2))
        .otherwise(col("na").cast("double") * col("nb"))
    m.join(broadcast(sizes.select(col("src").as("source_a"), col("n").as("na"))),
        "source_a")
      .join(broadcast(sizes.select(col("src").as("source_b"), col("n").as("nb"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        round(col("n_pairs").cast("double") / possible, 9).as("pair_rate"))
  }

  /** Population stability index between two corpus snapshots (C152;
    * the credit-scoring drift metric, standard in every feature-drift
    * monitor) — per group, PSI = Σ_b (p_new − p_old)·ln(p_new/p_old)
    * over power-of-two buckets of a metric (length here; any
    * non-negative integer feature plugs in). The operating folklore:
    * PSI < 0.1 stable, 0.1-0.25 investigate, > 0.25 the distribution
    * moved — the one-number sibling of [[categoryDrift]]'s per-bucket
    * deltas. Buckets are the D11/C104 `length(bin(x)) − 1` integer
    * recipe; counts are add-1 smoothed over the union bucket set
    * (zero buckets otherwise put ±∞ in the sum — smoothing is the
    * textbook fix and keeps every term finite and mirrored).
    *
    * Exactness: each bucket's ln rides the ratio of two exact-long
    * products ((c_n+1)·(t_o+nb)) / ((c_o+1)·(t_n+nb)), rounded ONCE
    * to micro-nats; the probability diff is two IEEE divisions and a
    * subtraction all in UNROUNDED double space — a pinned tree, but
    * pinned as doubles, so the diff·lnMicro product mixes a raw
    * double with a once-rounded long before its own single 1e-9
    * rounding (keep the oracle's term expression mirrored
    * character-for-character if this is ever refactored); the
    * per-group sum of the fixed-point terms is then an exact long —
    * no float accumulation order anywhere (the C37 discipline).
    *
    * Scale shape: each snapshot collapses map-side to (group, bucket)
    * counts; everything after runs on ≤|groups|·64-row frames. */
  def psiByGroup(oldDf: DataFrame, newDf: DataFrame,
                 group: Column, metric: Column): DataFrame = {
    def counted(df: DataFrame): DataFrame =
      df.select(group.as("source"),
          (length(bin(greatest(metric.cast("long"), lit(1L)))) - 1)
            .cast("long").as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    psiOverCounts(counted(oldDf), counted(newDf))
  }

  /** [[psiByGroup]] over two already-counted `(source, bucket, n)`
    * frames — the form the STREAMING drift monitor recomputes per
    * micro-batch (the A16/C18 `...OverCounts` discipline): the
    * reference window's counts are a pinned table, the live side is
    * the monitor's accumulated partial-count table. ONE definition of
    * the smoothing / micro-nat / fixed-point term tree, shared with
    * the batch operator, so the monitor and the oracle-gated path can
    * never diverge. */
  def psiOverCounts(oldCounts: DataFrame, newCounts: DataFrame): DataFrame = {
    val o = oldCounts.select(col("source"), col("bucket"), col("n").as("c_old"))
    val n = newCounts.select(col("source"), col("bucket"), col("n").as("c_new"))
    val cells = o.join(n, Seq("source", "bucket"), "full_outer")
      .select(col("source"), col("bucket"),
        coalesce(col("c_old"), lit(0L)).as("co"),
        coalesce(col("c_new"), lit(0L)).as("cn"))
    val tots = cells.groupBy(col("source"))
      .agg(sum(col("co")).as("to"), sum(col("cn")).as("tn"),
        count(lit(1)).as("nb"))
    val lnMicro = round(
      log((col("cn") + 1).cast("double") * (col("to") + col("nb")).cast("double")
        / ((col("co") + 1).cast("double") * (col("tn") + col("nb")).cast("double")))
        * lit(1e6)).cast("long")
    val diff = (col("cn") + 1).cast("double") / (col("tn") + col("nb")).cast("double") -
      (col("co") + 1).cast("double") / (col("to") + col("nb")).cast("double")
    cells.join(broadcast(tots), "source")
      .select(col("source"), col("nb"),
        round(diff * lnMicro.cast("double") * lit(1e3)).cast("long").as("term_fx"))
      .groupBy(col("source"))
      .agg(first(col("nb")).as("n_buckets"), sum(col("term_fx")).as("s"))
      .select(col("source"), col("n_buckets"),
        round(col("s").cast("double") / lit(1e9), 6).as("psi"))
  }

  /** C152 registered: PSI of the per-doc token-count distribution,
    * even doc_ids as the "old" snapshot vs odd as the "new" — per
    * source. The oracle replays buckets, smoothing, the once-rounded
    * micro-nat ln, the fixed-point terms and the exact sum. */
  val qPsi = Q(
    "qprofile_psi",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val toks = graft.functions.TextFunctions.tokenCountWs(col("text"))
      Profile.psiByGroup(
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2L)) === 1),
          col("source"), toks)
        .orderBy(col("source"))
    },
    Some("""
      WITH sized AS (SELECT doc_id, source,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents),
      b AS (SELECT doc_id, source,
              CAST(LENGTH(bin(greatest(n_tokens, 1))) - 1 AS BIGINT) AS bucket
            FROM sized),
      o AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS co
            FROM b WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      nn AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS cn
             FROM b WHERE doc_id % 2 = 1 GROUP BY 1, 2),
      cells AS (SELECT COALESCE(o.source, nn.source) AS source,
                  COALESCE(o.bucket, nn.bucket) AS bucket,
                  COALESCE(co, 0) AS co, COALESCE(cn, 0) AS cn
                FROM o FULL OUTER JOIN nn
                  ON o.source = nn.source AND o.bucket = nn.bucket),
      tots AS (SELECT source, CAST(SUM(co) AS BIGINT) AS t_o,
                 CAST(SUM(cn) AS BIGINT) AS t_n,
                 CAST(COUNT(*) AS BIGINT) AS nb
               FROM cells GROUP BY source),
      terms AS (SELECT c.source, t.nb,
                  CAST(ROUND((CAST(cn + 1 AS DOUBLE) / (t_n + nb)
                      - CAST(co + 1 AS DOUBLE) / (t_o + nb))
                    * CAST(CAST(ROUND(ln(CAST(cn + 1 AS DOUBLE) * (t_o + nb)
                        / (CAST(co + 1 AS DOUBLE) * (t_n + nb))) * 1e6)
                      AS BIGINT) AS DOUBLE)
                    * 1e3) AS BIGINT) AS term_fx
                FROM cells c JOIN tots t ON t.source = c.source)
      SELECT source, CAST(MIN(nb) AS BIGINT) AS n_buckets,
             ROUND(CAST(SUM(term_fx) AS DOUBLE) / 1e9, 6) AS psi
      FROM terms GROUP BY source
      ORDER BY source"""))

  /** C142 registered: the per-source TTR/hapax profile over the
    * documents table. The oracle recomputes the same (source, word)
    * counts and the two rounded divisions — exact longs up to the one
    * pinned IEEE division on each side. */
  val qTtr = Q(
    "qprofile_ttr",
    (s, dir) =>
      lexicalDiversity(Tables(s, dir).documents, col("source"), col("text"))
        .orderBy(col("source")),
    Some("""
      WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word
                    FROM documents),
      t AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM toks WHERE word <> '' GROUP BY source, word),
      a AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS n_types,
              CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
            FROM t GROUP BY source)
      SELECT source, n_tokens, n_types, n_hapax,
             ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
             ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_ratio
      FROM a ORDER BY source"""))

  val all: Seq[Q] = Seq(qSourceSim, qProfile, qProfileApprox, qProfileSources,
    qLengths, qIntegrity, qDrift, qOverlap, qOutliers, qOutliersApprox,
    qKeySkew, qKappa, qReliability, qHllRollup, qTtr, qPsi)
}
