package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide physical-plan guard: no registered query may plan a
  * CartesianProduct or an unbounded BroadcastNestedLoopJoin — the two
  * shapes that silently turn into O(n·m) compares at cluster scale.
  * This generalizes DedupSpec's per-operator assertion to the whole
  * query surface, so a future edit that degrades a join to a
  * cartesian fails CI, not the 100 TB run.
  *
  * Allowlist = joins that are BNLJ by construction but provably
  * bounded: broadcasting a 1-row aggregate (a scalar riding along) or
  * a non-equi range predicate against a frame that is small by
  * definition. Every entry must say WHY it is bounded.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTest._

  private val bnljAllowed: Map[String, String] = Map(
    "qcuration_dsir" -> ("crossJoin(broadcast(totals)) where totals is the " +
      "1-row (Nr, Nt) feature-count pair, joined onto the <= buckets-row " +
      "ratio frame (never the corpus)"),
    "qcuration_dsir_sample" -> ("EMBEDS the qcuration_dsir weight chain " +
      "(same 1-row totals broadcast); the Gumbel keying and top-k add no " +
      "join at all"),
    "qcuration_contam_sem" -> ("crossJoin(broadcast(ev)) where ev is the " +
      "eval-suite embedding table — small by construction; the corpus scans " +
      "once map-side against it (the qann_brute_topk shape with the roles " +
      "pinned: corpus scans, eval broadcasts)"),
    // qgraph_hits needs no entry since its half-steps became eagerly
    // checkpointed: the per-half-step 1-row max crossJoins run during
    // construction and the registered frame's plan is two checkpoint
    // scans joined on id — nothing BNLJ-shaped survives to audit
    "qprofile_source_sim" -> ("the source_a < source_b pair join runs " +
      "over the SKETCH frame — |sources| rows of 64 longs each, never " +
      "the corpus or its grams; the broadcast side is the whole point " +
      "of the union-MinHash collapse"),
    "qmix_temperature" -> ("the shared largestRemainder scalar " +
      "crossJoins (1-row total and leftover frames) onto the " +
      "<= |sources|-row allocation plan — the qsample_neyman shape"),
    "qmix_temperature75" -> ("same shared largestRemainder scalar " +
      "crossJoins as qmix_temperature; only the weight exponent " +
      "(alpha = 3/4 sqrt-chain product) differs"),
    "qpack_curriculum" -> ("crossJoin(broadcast(total)) — the 1-row " +
      "corpus token total joined onto the packShards-shaped prefix " +
      "frame for the stage cut; corpus rows ride partitioned windows"),
    "qsample_recency" -> ("crossJoin(broadcast(max_us)) — the 1-row " +
      "corpus max timestamp every event's age derives from — plus the " +
      "shared largestRemainder scalar crossJoins on the <= |groups|-row " +
      "plan frame (the qsample_neyman shape)"),
    "qsample_neyman" -> ("crossJoin(broadcast(tot)) and " +
      "crossJoin(broadcast(leftover)) — two 1-row scalar frames joined " +
      "onto the <= |sources|-row allocation plan; the corpus collapsed " +
      "to per-source moments one map-side agg earlier"),
    "qtext_lm_ref" -> ("crossJoin(broadcast(totals)) where totals is the " +
      "1-row N+V smoothing denominator of the reference LM, joined onto " +
      "the per-doc bigram partials"),
    "qtext_train_lr" -> ("crossJoin(broadcast(nDocs)) — the 1-row doc " +
      "count joined onto the <= nBuckets+1-row weight frame at each GD " +
      "step — plus crossJoin(broadcast(bias)), the trained 1-row bias " +
      "added to every per-doc score; the corpus itself only ever " +
      "equi-joins on bucket/doc_id"),
    "qtext_kn_ref" -> ("crossJoin(broadcast(totals)) where totals is the " +
      "1-row B+V continuation-smoothing denominator of the Kneser-Ney " +
      "model, joined onto the per-doc bigram partials (the qtext_lm_ref " +
      "shape)"),
    "qgraph_modularity" -> ("crossJoin(broadcast(m1)) where m1 is the " +
      "1-row undirected edge count, joined onto the per-community " +
      "aggregate (community count rows, never the corpus)"),
    "qmix_apply" -> ("EMBEDS the qmix_plan allocation chain (same 1-row " +
      "weight-total broadcast onto the ~10^2-row per-source frame); the " +
      "execution side adds only source-keyed equi-joins"),
    "qann_knn_graph" -> ("the qann_ivf_indexed broadcasts (bounded " +
      "nlist-row centroid frame in build and probe); making every corpus " +
      "vector a query adds no new join shape"),
    "qann_graph_search" -> ("the qann_knn_graph broadcasts (bounded " +
      "nlist-row centroid frame in the index build, graph build, and " +
      "search probe); the hop expansion itself is an equi-join on src — " +
      "ids only, never a nested loop"),
    "qvec_dbi" -> ("the bounded centroid broadcasts of the embedded cell " +
      "training plus an nlist x nlist centroid self-join and nlist-row " +
      "scatter joins — every non-equi side is <= nlist rows"),
    "qvec_silhouette" -> ("the bounded centroid broadcasts of the embedded " +
      "cell training plus the per-vector all-centroid scoring pass — the " +
      "non-equi side is the nlist-row centroid frame"),
    "qvec_ari" -> ("crossJoins broadcast 1-row pair-count scalar frames " +
      "(ta/tb/purity totals) onto the 1-row contingency aggregate, plus " +
      "the bounded centroid broadcast of the embedded cell training"),
    "qtext_bpe_apply_vocab" -> ("crossJoin(broadcast(marr)) where marr is " +
      "the 1-ROW collected merge-array frame (the whole 1024-merge table " +
      "as one array<struct> row) joined onto the distinct-word dictionary " +
      "frame — never the corpus; occurrences rejoin by word-keyed equi-join"),
    "qtext_bpe_apply_32k" -> ("the qtext_bpe_apply_vocab shape at the " +
      "shipped-tokenizer table size — the same 1-ROW collected " +
      "merge-array crossJoin(broadcast(marr)) onto the distinct-word " +
      "frame (one array row now holding ~33k structs, still one row); " +
      "occurrences rejoin by word-keyed equi-join"),
    "qtext_fertility_vocab" -> ("embeds qtext_bpe_apply_vocab's joined " +
      "formulation, so it inherits the same 1-row merge-array " +
      "crossJoin(broadcast(marr)) onto the distinct-word frame; the " +
      "rollup itself is one source-keyed map-side-combined aggregation"),
    "qtext_fertility_counts" -> ("the same embedded joined-apply shape as " +
      "qtext_fertility_vocab (1-row merge-array crossJoin(broadcast(marr)) " +
      "onto the distinct-word frame); the quarter-bucket rollup is one " +
      "(source, bucket)-keyed map-side-combined count"),
    "qtext_tfidf" -> "crossJoin(broadcast(n)) where n is a 1-row corpus count",
    "qtext_vocab" -> "crossJoin(broadcast(total)) where total is a 1-row token-count sum",
    "qtext_heavyhitters" -> ("crossJoin(broadcast(total)) where total is the " +
      "1-row map-side token count N of the Misra-Gries threshold, joined " +
      "onto the <= budget-sized recounted candidate frame (never the corpus)"),
    "qtext_unigram_lp" -> ("crossJoin(broadcast(total)) where total is a 1-row " +
      "token count, joined onto the vocab frame (never the corpus)"),
    "qtext_boilerplate_rm" -> ("crossJoin(broadcast(gramList)) where gramList is " +
      "a 1-row collected array bounded by the top-100 rank cut"),
    "qann_brute_topk" -> ("brute-force ANN IS all-pairs by definition; the " +
      "bounded side (the query set) is broadcast so the corpus never shuffles — " +
      "the scale path is qann_lsh_bucketed"),
    "qann_sq" -> ("the SQ8 crossJoins broadcast a 1-row per-dim (lo, hi) stats " +
      "table onto the codes frame and the bounded query set for scoring (the " +
      "qann_brute_topk shape); corpus rows carry byte codes, never vectors, " +
      "until the shortlist-only exact re-rank"),
    "qann_bq" -> ("the BQ crossJoins broadcast a 1-row per-dim threshold " +
      "table onto the codes frame and the bounded query set for the Hamming " +
      "scan (the qann_sq shape); corpus rows carry ceil(d/32) packed longs, " +
      "never vectors, until the shortlist-only exact re-rank"),
    "qann_bq_recall" -> ("EMBEDS qann_brute_topk as its truth side and " +
      "qann_bq as its result side — the same bounded 1-row threshold and " +
      "query-set broadcasts; the recall join itself is an exact " +
      "(query, neighbor) equi-join over two queries×k frames"),
    "qann_bq_asym" -> ("qann_bq's bounded 1-row threshold crossJoin for the " +
      "index encode plus the bounded query-set broadcast for the sign-sum " +
      "scan (the qann_sq shape); corpus rows still carry only ceil(d/32) " +
      "packed longs until the shortlist-only exact re-rank"),
    "qann_ivf_bq" -> ("the qann_ivf_trained nlist-row centroid broadcasts " +
      "(Lloyd train + assign + probe) plus qann_bq's bounded 1-row threshold " +
      "crossJoins for encoding; the Hamming scan itself joins candidate ids " +
      "to codes by EQUI-join — the composition's whole point is that it " +
      "scores only probed-cell members, nprobe/nlist of the corpus"),
    "qann_ivf_cellcounts" -> ("qann_ivf_trained's bounded nlist-row centroid " +
      "broadcasts (Lloyd train + the frozen-centroid assignment); everything " +
      "after is a map-side-combined (grp, cell) rollup bounded at nlist rows"),
    "qann_bq_bitcounts" -> ("qann_bq's bounded 1-row threshold crossJoin onto " +
      "the corpus for the bit explode; everything after is a map-side-combined " +
      "(grp, bucket) rollup bounded at 2·dim rows"),
    "qann_ivf_bq_asym" -> ("qann_ivf_bq's nlist-row centroid broadcasts plus " +
      "qann_bq's bounded 1-row threshold crossJoin for the index encode; the " +
      "sign-sum scan joins candidate ids to codes by EQUI-join and broadcasts " +
      "only the bounded fixed-point query set — same nprobe/nlist corpus bound " +
      "as the symmetric composition"),
    "qann_ivf_bq_asym_recall" -> ("EMBEDS qann_brute_topk as its truth side " +
      "and qann_ivf_bq_asym as its result side — the same bounded centroid/" +
      "threshold/query-set broadcasts; the recall join itself is an exact " +
      "(query, neighbor) equi-join over two queries×k frames"),
    "qann_ivf_bq_recall" -> ("EMBEDS qann_brute_topk as its truth side and " +
      "qann_ivf_bq as its result side — the same bounded centroid/threshold/" +
      "query-set broadcasts; the recall join itself is an exact " +
      "(query, neighbor) equi-join over two queries×k frames"),
    "qann_recall" -> ("the recall gate EMBEDS qann_brute_topk as its truth side " +
      "(same bounded query-set broadcast); the recall join itself is an exact " +
      "(query, neighbor) equi-join over two queries×k result frames"),
    "qann_recall_curve" -> ("EMBEDS qann_brute_topk once as the shared truth " +
      "side (bounded query-set broadcast); the three probe legs are the " +
      "allowlisted nlist-row centroid broadcasts and the per-leg recall joins " +
      "are exact (query, neighbor) equi-joins over queries×k frames"),
    "qann_mips" -> ("exact MIPS is all-pairs by definition; the bounded query " +
      "set broadcasts so the corpus never shuffles — the scale path is the " +
      "mipsAugment reduction onto the cosine indexes"),
    "qann_pq" -> ("the ADC crossJoins broadcast one LUT row per QUERY (m·ksub " +
      "doubles each) and a 1-row codeword-norm table onto the codes frame; " +
      "the corpus side carries m codes per row, never vectors, and the train " +
      "step's crossJoin is the bounded m·ksub codebook broadcast"),
    "qann_pq2" -> "the same bounded qann_pq broadcasts, once per Lloyd iteration",
    "qann_ivfpq" -> ("the same bounded broadcasts as qann_ivf_trained (nlist-row " +
      "centroid frame) and qann_pq (per-query LUT rows, 1-row codeword-norm " +
      "table); the candidate and ADC joins themselves are id-keyed equi-joins"),
    "qann_ivfpq_res" -> ("the qann_ivfpq broadcasts plus the residual variant's " +
      "per-(query, cell) centroid-dot crossJoin — |Q|·nlist rows, both factors " +
      "bounded; the residual join, cell-table attach and ADC joins are all " +
      "key-equi (cell / id) joins"),
    "qann_ivfpq_app" -> ("the same bounded qann_ivfpq_res broadcasts — the " +
      "append path adds only the |inc|·nlist map-side centroid-score " +
      "crossJoin (broadcast nlist-row centroid frame), the same shape the " +
      "build's assignment uses; the cells/codes unions are metadata-only"),
    "qann_ivfpq_rm" -> ("the qann_ivfpq_app shapes exactly (bounded " +
      "qann_ivfpq_res broadcasts plus the append's nlist-row centroid " +
      "crossJoin); the remove itself adds only vec_id-keyed anti-joins — " +
      "no new broadcast or cartesian"),
    "qann_ivfpq_upsert" -> ("remove ∘ append: the qann_ivfpq_rm shapes " +
      "(bounded qann_ivfpq_res broadcasts, the append leg's nlist-row " +
      "centroid crossJoin, vec_id-keyed anti-joins) — the union of the " +
      "two legs adds no new broadcast or cartesian"),
    "qann_ivfpq_pub" -> ("the qann_ivfpq_res broadcasts exactly — the " +
      "publish/read round-trip swaps the artifact frames' storage for " +
      "parquet scans of the committed generation and adds no join at all"),
    "qann_filtered" -> ("embeds qann_brute_topk over the predicate-filtered " +
      "corpus — the same bounded query-set broadcast; the scale path is " +
      "qann_filtered_ivf"),
    "qann_filtered_ivf" -> ("the qann_ivf_indexed broadcasts (bounded " +
      "centroid frame in build and probe); the predicate itself is an " +
      "id-only semi-join on the cells table"),
    "qann_mmr" -> ("embeds qann_brute_topk for its shortlist (bounded " +
      "query-set broadcast); the greedy selection itself runs locally " +
      "per query inside one mapPartitions over the shortlist-bounded " +
      "candidate frame"),
    "qann_hardneg" -> ("the bruteTopK shape: the training-batch-sized pair " +
      "set broadcasts with its anchor/positive vectors attached; the corpus " +
      "is scanned once map-side against it"),
    "qann_ivf" -> ("the crossJoin broadcasts the CENTROID frame — one row per " +
      "cell, bounded by nlist, never corpus-sized"),
    "qann_ivf_trained" -> ("same bounded centroid broadcast, in both the Lloyd " +
      "train step and the search"),
    "qann_ivf_indexed" -> ("same bounded centroid broadcasts in the ivfIndex " +
      "BUILD (Lloyd train + assignment) and the probe; the search itself is " +
      "an id-keyed candidate join against the materialized cells"),
    "qann_ivf_trained2" -> ("same bounded centroid broadcast, once per Lloyd " +
      "iteration and once in the search"),
    "qann_ivf_mrl" -> ("the qann_ivf_trained broadcasts with the quantizer " +
      "side sliced to the 16-dim prefix — same nlist-bounded centroid " +
      "frames in train, assign and probe; the re-rank join is id-keyed"),
    "qdedup_semantic" -> ("the Lloyd train step's bounded centroid broadcast " +
      "(nlist rows); the within-cell pair join itself is an equi-join on cell"),
    "qvec_prototypicality" -> ("the same bounded centroid broadcast, in the " +
      "Lloyd train step (the score join itself is an equi-join on cell)"),
    "qvec_inertia" -> ("the same bounded centroid broadcast, in the Lloyd " +
      "train step (the SSE join itself is an equi-join on cell)"),
    "qmix_plan" -> ("crossJoin(broadcast(wTot)) where wTot is a 1-row weight " +
      "total over the per-source frame — both sides bounded by source " +
      "cardinality, never corpus-sized"),
    "qtext_pmi" -> ("crossJoin(broadcast(total)) — the 1-row bigram grand " +
      "total onto the minCount-filtered bigram-vocab frame (the qmix_plan " +
      "1-row-total shape); the marginal joins are string-keyed equi-joins"),
    "qtext_ppl_bucket" -> ("embeds qtext_unigram_lp, so it inherits that " +
      "query's crossJoin(broadcast(total)) — the 1-row token-count total " +
      "onto the vocab frame, never the corpus; the bucket stage itself is " +
      "a collected 2-scalar cut plus a map-side when-chain"),
    "qtext_ppl_quantile" -> ("the same embedded qtext_unigram_lp " +
      "crossJoin(broadcast(total)) as qtext_ppl_bucket — the 1-row " +
      "token-count total onto the vocab frame; the quantile cut is a " +
      "collected 2-element sketch scalar plus a map-side when-chain"),
    "qprofile_drift" -> ("crossJoin(broadcast(tot)) where tot is the 1-row " +
      "(tot_old, tot_new) sum over the ~10²-row category frame — both sides " +
      "bounded by category cardinality, never corpus-sized"),
    "qtext_bm25" -> ("crossJoin(broadcast(stats)) where stats is the 1-row " +
      "(n_docs, total_tokens) index summary — the qtext_tfidf shape; the " +
      "postings and dl joins are term-/doc-keyed equi-joins and the query " +
      "set is a bounded broadcast"),
    "qtext_ql" -> ("crossJoin(broadcast(stats)) — the 1-row corpus LM " +
      "denominator — plus crossJoin(broadcast(qstats)), the <= |queries|-row " +
      "per-query constant frame every doc's ranking base joins; the corpus " +
      "itself only equi-joins on term/doc_id"),
    "qtext_hybrid_rrf" -> ("EMBEDS the qtext_bm25 and qtext_ql chains (the " +
      "same 1-row stats and <= |queries|-row constant broadcasts); the " +
      "fusion itself is a (query, doc) equi-join of two top-k-bounded " +
      "frames"),
    "qtext_bm25_indexed" -> ("the qtext_bm25 shape served from the " +
      "materialized index frames — the same 1-row stats broadcast, now " +
      "read from its parquet table"),
    "qtext_bm25_inc" -> ("the qtext_bm25 stats broadcast plus the append's " +
      "1-row x 1-row stats merge — both sides single-row scalar frames"),
    "qtext_bm25_rm" -> ("the qtext_bm25_inc shapes (stats broadcast, 1-row " +
      "x 1-row append stats merge) plus the remove's own 1-row x 1-row " +
      "stats shrink — every crossJoin factor a single-row scalar frame; " +
      "the postings/docs prune is a keyed anti-join"),
    "qtext_bm25_upsert" -> ("remove ∘ append: the qtext_bm25_rm shapes " +
      "exactly (1-row stats broadcasts on the search, the remove's and " +
      "append's 1-row x 1-row stats merges, keyed anti-joins on the " +
      "prune) — the composition adds no new broadcast or cartesian"),
    "qtext_bm25_sync" -> ("the qtext_bm25_upsert shapes (1-row stats " +
      "broadcasts and merges, keyed anti-joins) — the diff itself is a " +
      "payload-free doc_id-keyed full-outer md5 compare, and the change-" +
      "set cuts are id-keyed semi-joins; no new broadcast or cartesian"),
    "qtext_mrr" -> ("EMBEDS the qtext_bm25 chain (same 1-row stats " +
      "broadcast, bounded self-retrieval query set); the eval itself " +
      "runs on <= |queries| rows after the top-k"),
    "qpack_epoch" -> ("EMBEDS the qmix_plan allocation chain (same 1-row " +
      "weight-total crossJoin over the per-source frame); the cap and pack " +
      "stages themselves join only broadcast offset/allocation frames on " +
      "equi-keys"),
    "qvec_knn_label" -> ("embeds qann_brute_topk for the seed-neighbor " +
      "search (bounded query batch broadcast, labeled corpus scanned once " +
      "map-side); the label attach and vote are |queries|*k-row equi-joins"),
    "qann_matryoshka" -> ("embeds the qann_brute_topk shape four times " +
      "(full-dim truth + three prefix slices) — the same bounded " +
      "10-query broadcast against one corpus scan each; the recall " +
      "join runs on |queries|*k rows")
  )

  // ONE registry pass shared by every audit below: building a cluster
  // query's DataFrame executes its eager localCheckpoint pipeline (the
  // iterative CC actually runs), so a second full loop would re-execute
  // the most expensive pipelines in the suite just to re-derive these
  // strings.
  // COVERAGE NOTE: a localCheckpoint boundary truncates the visible
  // plan, so the cluster queries (qdedup_clusters/qdedup_apply) show
  // only their post-checkpoint tail here. Their upstream pair
  // pipeline is audited twice anyway: via qdedup_simhash (same plan,
  // un-checkpointed) and explicitly below.
  private lazy val physicalPlans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan
    }

  private lazy val planStrings: Seq[(String, String)] =
    physicalPlans.map { case (name, p) => name -> p.toString }

  /** Pre-order flatten that descends through the AQE wrapper (a
    * LeafExecNode whose real tree hangs off `inputPlan`, invisible to
    * `children`-based collect). */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case other                    => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("no registered query plans a cartesian or unbounded nested-loop join") {
    val offenders = planStrings.flatMap { case (name, plan) =>
      val cart = if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct") else None
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
        Some(s"$name: BroadcastNestedLoopJoin") else None
      cart.toSeq ++ bnlj.toSeq
    }
    assert(offenders.isEmpty, s"unbounded join shapes planned:\n${offenders.mkString("\n")}")
  }

  // Second guard class (round-8): an aggregate window with an
  // UnboundedPreceding..UnboundedFollowing frame buffers its ENTIRE
  // partition in one WindowExec task and — unlike rank()/row_number()
  // top-k filters — gets no map-side WindowGroupLimit rescue. Over a
  // low-cardinality key that funnels the whole table into a handful of
  // tasks (the q18 shape this audit was added to ban). Cardinality is
  // not statically knowable, so every allowed frame must state WHY its
  // partition key keeps per-task state bounded at 100 TB.
  private val unboundedWindowAllowed: Map[String, String] = Map(
    // round-9: the four bucket-cap entries (minhash_lsh, simhash,
    // incremental, embedding_lsh) are GONE — the cap is now a grouped
    // count + anti-join (Dedup.dropOverCapBuckets), so no WindowExec
    // buffers the degenerate bucket it evicts
    "qdedup_clusters" -> ("cluster_size count over cluster_id — " +
      "cardinality ≈ number of clusters (scales with docs); a partition " +
      "is one dup cluster, bounded by real-world dup-group size"),
    "qdedup_clusters_star" -> "same cluster_size count as qdedup_clusters"
    // qdedup_apply needs no entry: it consumes the clusters frame but
    // only reads doc_id/cluster_id, so Catalyst prunes the cluster_size
    // window out of its plan entirely (the self-cleaning check below
    // proved the exemption dead)
  )

  test("no registered query plans an unbounded-frame window outside the allowlist") {
    val offenders = planStrings.flatMap { case (name, plan) =>
      if (plan.contains("unboundedfollowing$()") && !unboundedWindowAllowed.contains(name))
        Some(s"$name plans an UnboundedFollowing window frame") else None
    }
    assert(offenders.isEmpty,
      s"whole-partition-buffering window frames planned:\n${offenders.mkString("\n")}")
  }

  // Third guard class (round-10): a PARTITION-LESS window funnels the
  // entire input through ONE task — the r9 bench tail was wall-to-wall
  // "No Partition Defined for Window operation" warnings. The shape is
  // fine only when the single task provably sees a BOUNDED row count:
  // (a) Spark's WindowGroupLimitExec rescue (a rank ≤ k filter plants
  // a partial top-k BEFORE the window, so only ~k·partitions rows
  // reach it), or (b) a global top-k / limit node below the window
  // (TakeOrderedAndProject / GlobalLimit — the row_number-filter and
  // .limit(k) shapes). Both are detected mechanically; anything else
  // must be allowlisted with the bound spelled out.
  private val globalWindowAllowed: Map[String, String] = Map(
    "qpack_shards" -> ("the partition-less prefix-sum window runs over " +
      "bucketTotals — ≤256 rows by construction (top-8-bit hash buckets); " +
      "the corpus itself takes the bucket-PARTITIONED windows"),
    "qpack_sequences" -> ("same two-pass prefix-sum: the global window " +
      "orders the per-(bucket, sub) totals frame — ≤ 64·256 rows by " +
      "construction — while corpus rows stay in partitioned windows"),
    "qsample_budget" -> ("embeds the packShards offset chain: the " +
      "partition-less window sums the ≤256-row bucket-totals frame, " +
      "never the corpus"),
    "qmix_temperature" -> ("the shared largestRemainder rank window " +
      "over the <= |sources|-row plan frame (the qsample_neyman shape)"),
    "qmix_temperature75" -> ("the same largestRemainder rank window " +
      "as qmix_temperature — <= |sources|-row plan frame"),
    "qsample_neyman" -> ("the largest-remainder rank window runs over " +
      "the per-source allocation plan frame — <= |sources| rows by " +
      "construction; the corpus collapsed to per-source moments one " +
      "map-side agg earlier"),
    "qpack_manifest" -> ("embeds packShards for the shard assignment: " +
      "the partition-less window is the same <= 256-row bucket-totals " +
      "offset sum; the manifest itself is one shard-keyed partial agg"),
    "qpack_curriculum" -> ("the packShards discipline keyed " +
      "(level, range): the partition-less window orders the " +
      "<= levels*256-row cell-totals frame (10 levels here), never " +
      "the corpus — corpus rows stay in (level, range) windows"),
    "qsample_recency" -> ("the shared largestRemainder rank window " +
      "over the <= |groups|-row allocation frame (the qsample_neyman " +
      "shape); events collapsed to per-group sums one map-side agg " +
      "earlier"),
    "qpack_epoch" -> ("embeds packShards after the mixture cap: the " +
      "partition-less window is the same ≤256-row bucket-totals offset " +
      "sum; capped corpus rows stay in (bucket)-partitioned windows")
  )

  private def unrescuedGlobalWindow(plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec, CollectLimitExec}
    flatten(plan).exists {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        !flatten(w.child).exists {
          case g: WindowGroupLimitExec     => g.partitionSpec.isEmpty
          case _: TakeOrderedAndProjectExec => true
          case _: GlobalLimitExec           => true
          case _: CollectLimitExec          => true
          case _                            => false
        }
      case _ => false
    }
  }

  test("every partition-less window is top-k-rescued or allowlisted") {
    val offenders = physicalPlans.flatMap { case (name, plan) =>
      if (unrescuedGlobalWindow(plan) && !globalWindowAllowed.contains(name))
        Some(s"$name plans an unrescued partition-less window (single-task funnel)")
      else None
    }
    assert(offenders.isEmpty,
      s"partition-less windows without a bounded-input rescue:\n${offenders.mkString("\n")}")
  }

  test("allowlists are self-cleaning: every entry names a query that plans its shape") {
    // a stale/misspelled entry is a permanent silent exemption — the
    // exact class of future bug these audits exist to catch
    val plans = planStrings.toMap
    for ((name, why) <- bnljAllowed) {
      assert(plans.contains(name), s"bnljAllowed entry '$name' is not a registered query")
      assert(plans(name).contains("BroadcastNestedLoopJoin"),
        s"bnljAllowed entry '$name' no longer plans a BNLJ — drop the exemption ($why)")
    }
    for ((name, why) <- unboundedWindowAllowed) {
      assert(plans.contains(name), s"unboundedWindowAllowed entry '$name' is not a registered query")
      assert(plans(name).contains("unboundedfollowing$()"),
        s"unboundedWindowAllowed entry '$name' no longer plans an unbounded frame — drop the exemption ($why)")
    }
    locally {
      val byName = physicalPlans.toMap
      for ((name, why) <- globalWindowAllowed) {
        assert(byName.contains(name), s"globalWindowAllowed entry '$name' is not a registered query")
        assert(unrescuedGlobalWindow(byName(name)),
          s"globalWindowAllowed entry '$name' no longer plans an unrescued global window — drop the exemption ($why)")
      }
    }
  }

  test("the detector recognizes the banned q18 shape") {
    // Reconstruct the exact plan q18 shipped with before round 8 — an
    // unbounded aggregate window over ~25-value p_brand — and prove the
    // string probe the audit relies on actually fires on it.
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import org.apache.spark.sql.expressions.Window
    val part = graft.sources.Tables(spark, sf).part
    val bad = part.withColumn("brand_avg",
      sum(col("p_retailprice")).over(Window.partitionBy(col("p_brand"))) /
        count(lit(1)).over(Window.partitionBy(col("p_brand"))))
    assert(bad.queryExecution.executedPlan.toString.contains("unboundedfollowing$()"),
      "probe string no longer matches Spark's plan rendering — update the audit")
    // and the fixed q18 must NOT contain it (nor any Window at all)
    assert(!planStrings.toMap.apply("q18_above_brand_avg").contains("unboundedfollowing$()"))
  }

  test("the checkpoint-hidden cluster pair pipeline is itself clean") {
    import org.apache.spark.sql.functions.col
    val t = graft.sources.Tables(spark, sf)
    val pairs = graft.operators.Dedup.simhashPairs(
      t.documents, col("doc_id"), col("text"), maxDist = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cluster pair generation plans an unbounded join:\n$plan")
  }
}
