package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dataset-curation operators for a training-data pipeline
  * (SURVEY.md §2.C14-C15): near-dup cluster resolution (pairs →
  * connected components → canonical doc) and deterministic hash-based
  * sampling. These are the steps that come AFTER the dedup pair
  * generators (Dedup.scala) in a real curation run: pairs alone don't
  * tell you which rows to keep.
  *
  * Everything here is seed-deterministic and shuffle-minimal:
  * sampling is a pure filter/window over an FNV-1a hash (pushes to the
  * scan, no shuffle for the bucket filter; one shuffle for the
  * stratified top-k), and clustering shuffles only the (long, long)
  * edge list — never document payloads.
  */
object Curation {

  /** Deterministic bucket in [0, buckets) from a key column: FNV-1a of
    * `salt + ":" + key` taken pmod buckets. The same (key, salt) maps to
    * the same bucket on any cluster size and any partitioning — this is
    * what makes samples reproducible across runs and re-shards, unlike
    * `rand(seed)` whose draw depends on partition layout.
    */
  def hashBucket(key: Column, buckets: Int, salt: String): Column =
    pmod(call_function("fnv1a64", concat(lit(salt + ":"), key.cast("string"))),
      lit(buckets.toLong))

  /** Deterministic ~pct% sample: keep rows whose [[hashBucket]] over
    * `key` falls below `pct`. A pure filter — fully parallel, no
    * shuffle, composes with column pruning (only `key` is evaluated on
    * filtered-out rows).
    */
  def sampleByHash(df: DataFrame, key: Column, pct: Int,
                   salt: String = "graft"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    df.withColumn("bucket", hashBucket(key, 100, salt))
      .filter(col("bucket") < pct)
  }

  /** Exactly min(k, |group|) rows per group, chosen by hash order — a
    * deterministic stratified sample (per-class caps for training-mix
    * balancing). One shuffle on the group key; ties (hash collisions)
    * break on the key itself so output is total-ordered and stable.
    * Emits `sample_rank` (1-based) so callers can sub-slice.
    */
  def samplePerGroup(df: DataFrame, group: Column, key: Column, k: Int,
                     salt: String = "strat"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(df.sparkSession)
    val h = call_function("fnv1a64", concat(lit(salt + ":"), key.cast("string")))
    df.withColumn("sample_rank",
        row_number().over(Window.partitionBy(group).orderBy(h, key)).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation: every node repeatedly takes the minimum
    * label among itself and its neighbors until a fixpoint. Returns
    * `(id, lbl)` where `lbl` is the minimum node id reachable from
    * `id` — the canonical representative of its component.
    *
    * Scale shape: converges in O(component diameter) rounds, ONE
    * shuffle per round, and only `(long, long)` rows ever move — the
    * edge list is persisted and the label frame is `localCheckpoint`ed
    * each round. The checkpoint is load-bearing, not an optimization:
    * each round's plan references the previous labels TWICE (own label
    * + the neighbor-min join), so without lineage truncation the
    * logical plan doubles per round and the driver OOMs on analysis
    * (observed at sf0.1). Near-dup components are shallow (dups of a
    * common source), so the round count is small in practice; for
    * adversarial chain-shaped graphs switch to alternating
    * large-star/small-star contraction (O(log n) rounds — Kiveris et
    * al., "Connected Components in MapReduce and Beyond"). At 100 TB,
    * use reliable `checkpoint()` to durable storage instead of
    * executor-local checkpoints.
    *
    * Convergence is detected by the label SUM (labels only ever
    * decrease, so an unchanged sum ⇔ an unchanged labeling) — a scalar
    * driver action per round, no extra join. Caches are released via
    * `spark.catalog.clearCache()` like the other dedup caches.
    */
  def connectedComponents(pairs: DataFrame, a: Column, b: Column,
                          maxIter: Int = 25): DataFrame = {
    val half = pairs.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()

    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("lbl").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nbr"))
        .withColumnRenamed("dst", "nid")
      val next = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
        .localCheckpoint() // eager: materializes AND truncates lineage
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels
  }

  /** Near-dup cluster resolution: run [[connectedComponents]] over a
    * dup-pair frame and emit `(doc_id, cluster_id, cluster_size)` —
    * `cluster_id` is the minimum member id (the doc a keep-first
    * curation run retains; every other member is the drop set). Docs
    * in no pair are their own singletons and are intentionally not
    * emitted — at scale the caller left-anti-joins the corpus against
    * the drop set instead of materializing per-doc rows.
    */
  def clusters(pairs: DataFrame, a: Column, b: Column): DataFrame =
    connectedComponents(pairs, a, b)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
}
