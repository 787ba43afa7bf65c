package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide partitioning-determinism guard: a query whose result
  * depends on the number of shuffle partitions (double-sum
  * accumulation order, unsorted collect_list, first() over an
  * unordered group) is broken at cluster scale even when every
  * fixed-partitioning test is green — the cluster WILL partition
  * differently than local[4]. This audit re-runs the most
  * hash/order-sensitive registered queries on a second session whose
  * only difference is a co-prime shuffle-partition count and demands
  * bit-identical rows. `newSession()` shares the SparkContext but owns
  * its SQLConf, so the probe can't race other suites sharing the
  * primary session.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTest._

  // the queries where partition-order dependence would hide: fixed-point
  // centroid/score sums, integer top-k boundaries, signature + bucket
  // joins, the distributed prefix sum, CC label propagation, and the
  // round's new rewrite/ANN composites
  private val picks = Seq(
    "qvec_centroid", "qtext_tfidf", "qdedup_minhash_lsh", "qpack_shards",
    "qtext_unigram_lp", "qdedup_passage_rm", "qdedup_clusters", "qann_ivfpq_res",
    "qdedup_lines", "qann_ivfpq_app", "qtext_bigram_lp", "qann_recall",
    "qann_sq", "qvec_inertia", "qtext_entropy",
    // r9 late additions: integer-rank top-k boundaries (vocab/PMI),
    // digest-keyed full-outer diff, and the composed recipe's
    // dedup-keep argmin through the persisted map chain
    "qtext_oov", "qtext_pmi", "qcorpus_diff", "qcuration_recipe",
    // r10: the BPE trainer's per-round argmax (weighted-count ties) and
    // the exact-decimal moment sums behind the corr closed forms
    "qtext_bpe", "q23_stats_corr", "q24_gapfill", "qvec_pca", "qprofile_drift",
    // this session: the learned-merge tokenization (argmax chain feeds a
    // byte-exact stream) and the weighted sample's global top-k boundary
    "qtext_bpe_apply", "qsample_weighted",
    // iterative integer fixpoint: 5 join+agg rounds, any accumulation-
    // order dependence compounds across rounds
    "qgraph_pagerank",
    // this round: DSIR's per-doc micro-nat sums (integer-exact by
    // design — prove it), the semantic-contamination argmax window,
    // and the HITS max-normalized integer fixpoint (6 half-steps)
    "qcuration_dsir", "qcuration_contam_sem", "qgraph_hits",
    // the reference-LM's per-(doc, bigram) micro-nat rounding + sums
    "qtext_lm_ref",
    // the ARI's pair-count sums + pinned double tree over the trained cells
    "qvec_ari",
    // this session: the MG sketch's candidates are partitioning-
    // DEPENDENT by design — the exact-recount output must not be (the
    // operator's central claim, probed here on the real corpus); the
    // LPA vote argmax ties; the PPR integer rounds; the oriented
    // wedge pairing behind the triangle counts
    "qtext_heavyhitters", "qgraph_labelprop", "qgraph_ppr", "qgraph_triangles",
    // the Gumbel top-k boundary (integer key sum over a composed DSIR
    // chain) and the exact-moment Pearson tree over edge-end degrees
    "qcuration_dsir_sample", "qgraph_assortativity",
    // r10: the KN micro-nat type-count tree; the coreness 32-round
    // continued peel; modularity's exact decimal contribution; the two
    // new (group, sub-bucket) two-pass prefix sums, whose ranks/cumsums
    // would drift under a changed partitioning if any stage leaked
    // physical order
    "qtext_kn_ref", "qgraph_coreness", "qgraph_modularity",
    "qpack_length_buckets", "qcuration_source_cap", "qmix_apply",
    // this session: the GD trainer's per-step integer gradient sums
    // (any accumulation-order drift compounds across 5 steps), the
    // DBI/silhouette fixed-point distance sums + argmin/argmax over
    // trained cells, and the cell-blocked point-in-interval counts
    "qtext_train_lr", "qvec_dbi", "qvec_silhouette", "q30_interval_join",
    // retrieval: micro-nat contribution sums + integer rank boundaries,
    // and the fused ranking over two such lists
    "qtext_ql", "qtext_hybrid_rrf",
    // r11: union-MinHash slot mins (map-side min partials in any
    // order), the CUSUM running prefix/min frames, the largest-
    // remainder ±1 boundaries of both allocators, the manifest's
    // mod-2^64 checksum (order-independence is its CONTRACT), the
    // keep-min byte attribution through CC, and the standardize
    // moment sums + per-element rounding
    "qprofile_source_sim", "qlog_cusum", "qsample_neyman",
    "qmix_temperature", "qmix_temperature75", "qpack_manifest", "qdedup_report",
    "qpack_curriculum", "qmm_ar_buckets", "qsample_recency", "qgraph_khop",
    "qvec_standardize", "qlog_seasonal",
    // RAKE: per-doc integral word scores summed into phrase ranks
    "qtext_rake",
    // r13: the vocabulary-JOIN BPE apply — the collected merge array
    // (array_sort on step), the per-doc position reassembly (array_sort
    // on pos) and the chain builder's rank/step windows must all be
    // partitioning-invariant for the byte-exact token stream to hold;
    // the typed BFS runs hop-indexed set states with a min-dist agg —
    // set semantics must make it partitioning-invariant like C148;
    // BQ's threshold sums are map-side long partials in any order and
    // its Hamming shortlist boundary is exact integers — prove both
    "qtext_merge_chains", "qtext_bpe_apply_vocab", "qgraph_khop_typed",
    "qann_bq",
    // r14: the composed IVF+BQ pass (Lloyd cells + decimal threshold
    // sums + integer Hamming boundary stacked — any stage leaking
    // partition order moves the shortlist), the asymmetric sign-sum
    // scan (per-dim decimal/long products summed map-side), and the
    // approx profile/outlier entry points (GK and HLL sketches are
    // merge-order-sensitive ONLY if the implementation cheats —
    // Spark's are mergeable by contract; prove the outputs hold)
    "qann_ivf_bq", "qann_bq_asym", "qprofile_outliers_q",
    "qprofile_table_approx")

  test("hash- and order-sensitive queries are invariant to shuffle partitioning") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7") // co-prime to the base 4
    for (name <- picks) {
      val base = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted
      spark.catalog.clearCache()
      val moved = SparkEntry.queries(name)(alt, sf).collect().map(_.toString).sorted
      alt.catalog.clearCache()
      assert(base.length == moved.length,
        s"$name row count differs across shuffle partitionings: ${base.length} vs ${moved.length}")
      val firstDiff = base.zip(moved).indexWhere { case (a, b) => a != b }
      if (firstDiff >= 0) fail(
        s"$name differs across shuffle partitionings at sorted row $firstDiff: " +
          s"${base(firstDiff)} vs ${moved(firstDiff)}")
    }
  }
}
