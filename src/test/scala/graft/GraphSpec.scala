package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  import SparkTest._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), col("src"), col("dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: a regular cycle is the exact fixpoint at every iteration") {
    // 3-cycle: every node has outdeg 1 and one in-edge carrying full
    // mass — ρ' = 150000 + 850000·1e6/1e6 = 1e6 exactly, forever
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(ranks(cyc, 1).values.toSet == Set(1000000L))
    assert(ranks(cyc, 7).values.toSet == Set(1000000L))
  }

  test("pageRank: star hub accumulates, leaves decay, dangling mass leaks") {
    // a,b,c → h. Round 1: leaves 150000 (no in-edges), h = 150000 +
    // 850000·(3·1e6) div 1e6 = 2 700 000. Round 2: h = 150000 +
    // 850000·(3·150000) div 1e6 = 532 500 (h's own mass leaked — h is
    // dangling, the documented simple variant).
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L))
    val r1 = ranks(star, 1)
    assert(r1(9L) == 2700000L && r1(1L) == 150000L, s"got $r1")
    val r2 = ranks(star, 2)
    assert(r2(9L) == 532500L && r2(1L) == 150000L, s"got $r2")
  }

  test("pageRank: self-loops dropped, duplicate edges count once") {
    // (1,2) twice + (1,1): node 1's outdeg must be 1, so node 2 gets
    // the FULL damped mass, not half of it
    val e = Seq((1L, 2L), (1L, 2L), (1L, 1L))
    val r1 = ranks(e, 1)
    assert(r1(2L) == 1000000L, s"got $r1") // 150000 + 850000·1e6 div 1e6
    assert(r1(1L) == 150000L, s"got $r1")
  }

  test("pageRank: rank mass ordering matches in-degree skew on the query graph") {
    import spark.implicits._
    // the registered query's shape in miniature: hubs (id % 5) over 40
    // nodes — hub 0 also collects the tree edge mass; every hub must
    // outrank every non-hub leaf
    val d = (0L until 40L).toDF("doc_id")
    val edges = d.select(col("doc_id").as("src"), pmod(col("doc_id"), lit(5L)).as("dst"))
      .unionAll(d.select(col("doc_id").as("src"), expr("doc_id div 2").as("dst")))
    val r = Graph.pageRank(edges, col("src"), col("dst"), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val hubs = (0L until 5L).map(r)
    val leaves = (20L until 40L).map(r) // no tree children, not hubs
    assert(hubs.min > leaves.max,
      s"hubs $hubs must outrank leaves max ${leaves.max}")
  }

  test("HITS separates the directory hub from the content authorities") {
    import spark.implicits._
    // d (100) links all three content pages; x,y (101,102) link only
    // a1 — a1 is the top authority, d the top hub; content pages that
    // link nothing have hub 0, pure linkers have authority 0
    val e = Seq((100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (102L, 1L)).toDF("src", "dst")
    val r = Graph.hits(e, col("src"), col("dst"), iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // max-normalization pins the top of each scale at exactly 1e6
    assert(r(1L)._1 == 1000000L, s"a1 must be the unit authority: $r")
    assert(r(100L)._2 == 1000000L, s"d must be the unit hub: $r")
    assert(r(1L)._1 > r(2L)._1 && r(2L)._1 == r(3L)._1, s"authority order: $r")
    assert(r(100L)._2 > r(101L)._2 && r(101L)._2 == r(102L)._2, s"hub order: $r")
    assert(Seq(1L, 2L, 3L).forall(r(_)._2 == 0L), s"content pages are not hubs: $r")
    assert(Seq(100L, 101L, 102L).forall(r(_)._1 == 0L), s"linkers are not authorities: $r")
  }

  test("pageRank damped term survives contribution sums past Long.MaxValue/damping") {
    // a 2e7-leaf star gives the hub cs = 2e13; 850000 * 2e13 = 1.7e19
    // wraps a long multiply silently negative — pin the DECIMAL(38,0)
    // form at exactly that magnitude without materializing the graph
    val wide = spark.sql(
      "SELECT (CAST(850000 AS DECIMAL(38,0)) * 20000000000000) div 1000000 AS v")
      .head().getLong(0)
    assert(wide == 17000000000000L, s"got $wide")
    val wrapped = spark.sql(
      "SELECT CAST(850000 AS BIGINT) * 20000000000000 AS v")
    // the unwidened multiply really does exceed Long range (ANSI mode
    // errors; legacy mode wraps negative) — either way it is unusable
    val bare = scala.util.Try(wrapped.head().getLong(0))
    assert(bare.isFailure || bare.get < 0L, s"expected overflow, got $bare")
  }

  test("labelPropagate: frontier growth, clamping, vote ties, unreached nodes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // path 1-2-3-4 seeded at node 1 (label 7): the frontier reaches one
    // hop per round; isolated edge 8-9 has no seed and stays NULL
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("s", "d")
    val seeds = Seq((1L, 7L)).toDF("id", "lab")
    def run(iters: Int) =
      graft.operators.Graph.labelPropagate(edges, col("s"), col("d"),
          seeds, col("id"), col("lab"), iters)
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toMap
    val after1 = run(1)
    assert(after1(2L)._1.contains(7L) && after1(3L)._1.isEmpty,
      s"one round reaches exactly one hop: $after1")
    val after3 = run(3)
    assert(Seq(1L, 2L, 3L, 4L).forall(after3(_)._1.contains(7L)), s"$after3")
    assert(after3(8L)._1.isEmpty && after3(9L)._1.isEmpty,
      s"unreached component stays NULL: $after3")
    assert(after3(1L)._2 && !after3(2L)._2, s"is_seed marks seeds only: $after3")

    // ties break toward the SMALLEST label, and seeds are clamped even
    // when outvoted: node 0 hears labels {5, 3} (one vote each) → 3;
    // seed node 10 (label 9) hears two votes of 1 but keeps 9
    val e2 = Seq((1L, 0L), (2L, 0L), (3L, 10L), (4L, 10L)).toDF("s", "d")
    val s2 = Seq((1L, 5L), (2L, 3L), (3L, 1L), (4L, 1L), (10L, 9L)).toDF("id", "lab")
    val r2 = graft.operators.Graph.labelPropagate(e2, col("s"), col("d"),
        s2, col("id"), col("lab"), iters = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(r2(0L).contains(3L), s"tie must take the smaller label: $r2")
    assert(r2(10L).contains(9L), s"clamped seed keeps its label: $r2")

    // conflicting duplicate seed rows collapse to the min label before
    // any voting — join multiplicity must not leak into counts
    val s3 = Seq((1L, 7L), (1L, 2L)).toDF("id", "lab")
    val r3 = graft.operators.Graph.labelPropagate(edges, col("s"), col("d"),
        s3, col("id"), col("lab"), iters = 1)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(r3(1L).contains(2L) && r3(2L).contains(2L), s"$r3")
  }

  test("triangleStats: K4, triangle-free square, star with one cross edge, dup edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    // star 20-(21..25) plus ONE cross edge 21-22 → exactly one triangle
    val star = (21L to 25L).map(l => (20L, l)) :+ (21L, 22L)
    // duplicates, reversals, and a self-loop must all collapse/drop
    val noise = Seq((2L, 1L), (1L, 2L), (3L, 3L))
    val edges = (k4 ++ square ++ star ++ noise).toDF("s", "d")
    val r = graft.operators.Graph.triangleStats(edges, col("s"), col("d"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3)))
      .toMap
    // K4: every node degree 3, member of 3 triangles, clustering 1.0
    for (id <- 1L to 4L) assert(r(id) == ((3L, 3L, 1.0)), s"$id: ${r(id)}")
    // square: degree 2, no triangles
    for (id <- 10L to 13L) assert(r(id) == ((2L, 0L, 0.0)), s"$id: ${r(id)}")
    // star: center degree 5, in 1 triangle, clustering 2·1/(5·4) = 0.1;
    // the high-degree hub corner must be counted exactly once even
    // though the wedge is generated at a low-rank corner
    assert(r(20L) == ((5L, 1L, 0.1)), s"center: ${r(20L)}")
    assert(r(21L) == ((2L, 1L, 1.0)) && r(22L) == ((2L, 1L, 1.0)), s"$r")
    for (id <- 23L to 25L) assert(r(id) == ((1L, 0L, 0.0)), s"leaf $id: ${r(id)}")
    // total triangle mass: 4 (K4) + 1 (star), each counted at 3 corners
    assert(r.values.map(_._2).sum == 15L, s"$r")
  }

  test("kCore: cascade peeling, fixpoint stability, k=2 cycle, tree dissolves") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // K4 {1..4} with a pendant chain 4-5-6-7: the chain peels one node
    // per round from the tip (7, then 6, then 5) — round budget below
    // the cascade depth must leave the tail partially peeled, proving
    // rounds are synchronous layers, not a full drain
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (k4 ++ chain).toDF("s", "d")
    def core(k: Int, iters: Int) =
      graft.operators.Graph.kCore(edges, col("s"), col("d"), k, iters)
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    val partial = core(2, 2) // 7 gone round 1, 6 gone round 2; 5 still in
    assert(!partial(7L)._1 && !partial(6L)._1 && partial(5L)._1, s"$partial")
    val full = core(2, 5)
    assert(Seq(1L, 2L, 3L, 4L).forall(full(_)._1), s"$full")
    assert(Seq(5L, 6L, 7L).forall(!full(_)._1), s"$full")
    // stability: one extra round changes nothing once the peel is done
    assert(core(2, 6) == full, "fixpoint must be stable")
    // core degrees are WITHIN the surviving subgraph: node 4 had raw
    // degree 4 (K4 + chain), core degree 3
    assert(full(4L) == ((true, 3L)), s"${full(4L)}")
    // k=3: K4 survives exactly
    val k3 = core(3, 5)
    assert(Seq(1L, 2L, 3L, 4L).forall(k3(_)._1) &&
      Seq(5L, 6L, 7L).forall(!k3(_)._1), s"$k3")
    // a pure cycle is its own 2-core; a tree has NO 2-core at all
    val cyc = Seq((10L, 11L), (11L, 12L), (12L, 10L)).toDF("s", "d")
    val rc = graft.operators.Graph.kCore(cyc, col("s"), col("d"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rc.values.forall(identity), s"$rc")
    val tree = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L)).toDF("s", "d")
    val rt = graft.operators.Graph.kCore(tree, col("s"), col("d"), k = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rt.values.forall(v => !v), s"$rt")
  }

  test("personalized PageRank: seed mass decays with distance, hard 0 beyond reach") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // directed chain 1→2→3 seeded at 1, plus a seedless component 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 10L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    def run(iters: Int) =
      graft.operators.Graph.personalizedPageRank(edges, col("s"), col("d"),
          seeds, col("id"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val r1 = run(1)
    // round 1: seed keeps the base term, hop 1 gets damped full mass,
    // hop 2 is still EXACTLY zero (integer form: no float residue)
    assert(r1(1L) == 150000L && r1(2L) == 850000L && r1(3L) == 0L, s"$r1")
    val r2 = run(2)
    assert(r2(3L) == 722500L, s"two hops: 0.85^2 * 1e6 exactly: $r2")
    // the seedless component scores hard 0 at every depth
    assert(r1(9L) == 0L && r1(10L) == 0L && r2(9L) == 0L && r2(10L) == 0L,
      s"$r1 / $r2")
    // seeding EVERY node recovers plain pageRank exactly (same init,
    // same recursion) — the operators must agree long-for-long
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val allSeeds = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id")
    val pr = graft.operators.Graph.pageRank(cyc, col("s"), col("d"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ppr = graft.operators.Graph.personalizedPageRank(cyc, col("s"), col("d"),
        allSeeds, col("id"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr == ppr, s"$pr vs $ppr")
  }

  test("degreeProfile: integer log2 buckets, exact power-of-two boundary, ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // star: center 0 with EXACTLY 8 leaves — degree 8 must land in
    // bucket 3 [8, 15], the boundary a float log2 could misround;
    // leaves have degree 1 → bucket 0 [1, 1]. Duplicates and
    // reversals must not inflate any degree.
    val star = (1L to 8L).flatMap(l => Seq((0L, l), (l, 0L), (0L, l)))
    val edges = star.toDF("s", "d")
    val r = graft.operators.Graph.degreeProfile(edges, col("s"), col("d"))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    assert(r.keySet == Set(0L, 3L), s"$r")
    assert(r(0L) == ((1L, 1L, 8L, 1L, 1L)), s"leaves: ${r(0L)}")
    assert(r(3L) == ((8L, 15L, 1L, 8L, 8L)), s"center: ${r(3L)}")
  }

  test("assortativity: star is exactly -1, regular graph is NULL, noise collapses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2-leaf star: symmetrized pairs (2,1)x2, (1,2)x2 — the two-point
    // anti-correlated distribution where every moment AND both sqrt
    // arguments are perfect squares, so r = -1.0 EXACTLY, no epsilon
    val star = Seq((0L, 1L), (0L, 2L), (1L, 0L), (0L, 1L)).toDF("s", "d")
    val rs = graft.operators.Graph.assortativity(star, col("s"), col("d")).head()
    assert(rs.getLong(0) == 4L && rs.getDouble(1) == -1.0, s"$rs")
    // a cycle is 2-regular: zero degree variance, r undefined → NULL
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val rc = graft.operators.Graph.assortativity(cyc, col("s"), col("d")).head()
    assert(rc.getLong(0) == 6L && rc.isNullAt(1), s"$rc")
  }

  test("coreness: K4=3, cycle=2, tree=1, pendant chain, maxK cap, exact partition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // K4 {1..4} + pendant chain 4-5-6 + disjoint triangle {10,11,12}
    // + disjoint path 20-21
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))).toDF("s", "d")
    def run(maxK: Int) =
      graft.operators.Graph.coreness(edges, col("s"), col("d"), maxK, itersPerK = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = run(4)
    // every node appears exactly once
    assert(c.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L, 20L, 21L), s"$c")
    for (id <- 1L to 4L) assert(c(id) == 3L, s"K4 member $id: ${c(id)}")
    for (id <- Seq(5L, 6L, 20L, 21L)) assert(c(id) == 1L, s"tendril $id: ${c(id)}")
    for (id <- Seq(10L, 11L, 12L)) assert(c(id) == 2L, s"triangle $id: ${c(id)}")
    // the cap is honest: maxK=2 reports K4 members as 2, rest unchanged
    val capped = run(2)
    for (id <- 1L to 4L) assert(capped(id) == 2L, s"capped $id: ${capped(id)}")
    assert(capped.view.filterKeys(_ > 4L).toMap ==
      c.view.filterKeys(_ > 4L).toMap, s"$capped")
  }

  test("modularity: two bridged triangles, single community, unlabeled fallback") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4: m=7,
    // per-community e_c=3, d_c=7 →
    // q_micro = round(1e6·(4·7·3 − 49)/(4·49)) = round(178571.43) = 178571
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("s", "d")
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L).toDF("id", "c")
    val got = graft.operators.Graph.modularity(
        edges, col("s"), col("d"), labels, col("id"), col("c"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(10L -> ((3L, 3L, 7L, 178571L)),
      20L -> ((3L, 3L, 7L, 178571L))), s"$got")
    // the whole graph as one community: e_c = m, d_c = 2m → Q = 0 exactly
    val one = graft.operators.Graph.modularity(
        edges, col("s"), col("d"),
        labels.select(col("id"), org.apache.spark.sql.functions.lit(7L).as("c")),
        col("id"), col("c"))
      .collect()
    assert(one.length == 1 && one(0).getLong(4) == 0L, one.mkString(","))
    // nodes absent from the label frame land in the stated −1 community
    val partial = graft.operators.Graph.modularity(
        edges, col("s"), col("d"),
        labels.filter(col("id") <= 3L), col("id"), col("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial == Map(10L -> 3L, -1L -> 3L), s"$partial")
    // duplicate + reversed + self-loop edges don't change the counts
    val noisy = edges.unionAll(Seq((2L, 1L), (1L, 1L), (3L, 1L)).toDF("s", "d"))
    val got2 = graft.operators.Graph.modularity(
        noisy, col("s"), col("d"), labels, col("id"), col("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got2 == Map(10L -> 178571L, 20L -> 178571L), s"$got2")
  }

  test("checkpointed loops keep the Catalyst size estimate bounded (32+ rounds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Regression for the qgraph_coreness driver hang: Dataset.checkpoint
    // copies the source plan's sizeInBytes onto the checkpointed
    // LogicalRDD, and the size-only stats visitor estimates a join as
    // the PRODUCT of its children — so a loop joining the checkpointed
    // frame twice per round squared the carried estimate every round
    // (bit length doubles; ~2^32 bits by round 32, and the stats
    // rewrite inside the NEXT checkpoint ground forever in
    // BigInteger.multiply). The blowup is data-independent: this tiny
    // graph with the registered query's exact checkpoint count
    // (maxK × itersPerK = 32) hung before the truncateLineage fix.
    val edges = (1L to 12L).flatMap(a => Seq((a, a % 12 + 1), (a, (a + 3) % 12 + 1)))
      .toDF("s", "d")
    val out = graft.operators.Graph.coreness(
      edges, col("s"), col("d"), maxK = 16, itersPerK = 2)
    assert(out.count() == 12L)
    // the final plan's estimate must be sane, not a compounded product
    val bits = out.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits < 10000, s"sizeInBytes estimate has $bits bits — the " +
      "checkpoint is carrying a compounding join-product estimate again")
  }
}
