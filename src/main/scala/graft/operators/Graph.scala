package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph operators (SURVEY.md §2.C88). PageRank is the classic
  * web-curation authority signal (Page et al. 1999; Common Crawl
  * publishes exactly this ranking over its host graph): a domain- or
  * page-level quality prior the mixture/filter stages (C23, C81)
  * consume, from the same link structure the blocklist and domain
  * operators already extract.
  */
object Graph {

  /** Deterministic fixed-iteration PageRank over an edge list.
    *
    * Ranks are AVERAGE-RELATIVE fixed-point integers: store
    * `ρ = rank · N` in micro units (init 1 000 000), so the update is
    * scale-free — `ρ' (v) = (1 − d) + d · Σ ρ(u)/outdeg(u)` — and no
    * N-dependent division ever happens (at 10¹⁰ nodes a rank scaled
    * to total mass would underflow any fixed point). Every step is
    * exact integer arithmetic: per-edge contribution is
    * `ρ div outdeg` (one truncation, mirrored by the oracle), the
    * damped term is one multiply + `div 1e6`. Bit-identical on any
    * engine and partitioning — a double-summed PageRank is not.
    *
    * Contract notes: a fixed `iters` (the production norm — Common
    * Crawl runs a fixed iteration budget) rather than a convergence
    * test keeps the oracle a finite CTE unroll; dangling nodes (no
    * out-edges) LEAK their damped mass instead of redistributing it —
    * the simple variant, stated rather than hidden (redistribution
    * adds one 1-row aggregate per round if needed); self-loops are
    * dropped (a page voting for itself is not authority); duplicate
    * edges count once — `(src, dst)` is distinct-ed, the host-graph
    * convention.
    *
    * Scale shape: the CC-resolution discipline — edges and ranks are
    * (long, long) rows; each round is ONE src-keyed join + ONE
    * dst-keyed partial-agg shuffle; the rank frame persists per round
    * and the previous round unpersists; nodes with no in-edges keep
    * the base term via the left join. Output: (node_id, rank_micro,
    * rank) — rank is the one cosmetic double division.
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int = 5, dampingMicro: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 30, s"iters must be in [1, 30], got $iters")
    require(dampingMicro > 0 && dampingMicro < 1000000L,
      s"dampingMicro must be in (0, 1e6), got $dampingMicro")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = 1000000L - dampingMicro
    var ranks = nodes.select(col("id"), lit(1000000L).as("rm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        val contribs = withDeg
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rm div deg").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("cs"))
        // the damped term widens to DECIMAL(38,0) before the multiply:
        // a high in-degree hub on a 10^7+-node graph has cs past
        // Long.MaxValue/dampingMicro (~1e13), and a bare long multiply
        // would wrap silently negative — the oracle mirrors with
        // HUGEINT; `div` truncates identically on the nonnegative
        // fixed-point values
        val next = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(
              s"(CAST($dampingMicro AS DECIMAL(38,0)) * coalesce(cs, 0L)) div 1000000"))
              .as("rm"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent
        ranks.unpersist()
        ranks = next
      }
      ranks.select(col("id").as("node_id"), col("rm").as("rank_micro"),
        (col("rm").cast("double") / lit(1e6)).as("rank"))
    } finally { e.unpersist(); nodes.unpersist(); withDeg.unpersist() }
  }

  /** C88 oracle generator: the engine's integer update unrolled as one
    * linear CTE chain (r_k referenced exactly once by r_{k+1} — the
    * DuckDB CTE-inlining discipline), `//` mirroring `div` on the
    * nonnegative fixed-point values term-for-term. */
  private def pageRankOracleSql(iters: Int, dampingMicro: Long): String = {
    val base = 1000000L - dampingMicro
    val sb = new StringBuilder(
      s"""WITH eraw AS (
        SELECT doc_id AS src, doc_id % 50 AS dst FROM documents
        UNION ALL
        SELECT doc_id AS src, doc_id // 2 AS dst FROM documents),
      e AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
      n AS MATERIALIZED (SELECT DISTINCT id FROM
        (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
      od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                          FROM e GROUP BY src),
      r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rm FROM n)""")
    for (k <- 1 to iters) sb ++= s""",
      r$k AS (SELECT n.id,
          CAST($base + (CAST($dampingMicro AS HUGEINT) * COALESCE(s.cs, 0)) // 1000000 AS BIGINT) AS rm
        FROM n LEFT JOIN (
          SELECT e.dst AS id, SUM(r.rm // od.deg) AS cs
          FROM e JOIN r${k - 1} r ON r.id = e.src
                 JOIN od ON od.src = e.src
          GROUP BY e.dst) s ON s.id = n.id)"""
    sb ++= s"""
      SELECT id AS node_id, rm AS rank_micro,
             CAST(rm AS DOUBLE) / 1000000 AS rank
      FROM r$iters ORDER BY node_id"""
    sb.toString
  }

  // C88: PageRank over an injected doc-id link graph — 50 hub targets
  // (doc_id % 50: heavy in-degree skew) plus a binary-tree edge toward
  // low ids (doc_id // 2: depth ~log n, so 5 iterations genuinely
  // propagate). The oracle replays all 5 integer rounds; any
  // accumulation-order or truncation drift breaks the hash.
  val qPageRank = Q(
    "qgraph_pagerank",
    (s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"))
      val edges = d.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(50L)).as("dst"))
        .unionAll(d.select(col("doc_id").as("src"),
          expr("doc_id div 2").as("dst")))
      pageRank(edges, col("src"), col("dst"), iters = 5)
        .orderBy(col("node_id"))
    },
    Some(pageRankOracleSql(5, 850000L)))

  val all: Seq[Q] = Seq(qPageRank)
}
