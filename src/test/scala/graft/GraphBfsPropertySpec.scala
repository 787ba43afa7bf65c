package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Profile}
import graft.functions.TextFunctions

/** Property coverage for the round-12 detectors against in-memory
  * reference implementations: the distributed BFS must equal a plain
  * Scala BFS on arbitrary graphs, PSI is non-negative by construction
  * (each (p−q)·ln(p/q) term is), and the codepoint classes partition
  * the character count exactly. Fixed-seed raw generators, the
  * RoutingPropertySpec recipe.
  */
class GraphBfsPropertySpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val graphGen: Gen[(Seq[(Long, Long)], Seq[Long], Int)] = for {
    n <- Gen.chooseNum(4, 24)
    m <- Gen.chooseNum(3, 40)
    edges <- Gen.listOfN(m,
      Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    nSeeds <- Gen.chooseNum(1, 3)
    seeds <- Gen.listOfN(nSeeds, Gen.chooseNum(0L, n - 1L))
    k <- Gen.chooseNum(1, 5)
  } yield (edges, seeds.distinct, k)

  /** Plain BFS over the same canonical undirected simple graph. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     k: Int): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    var h = 1L
    while (h <= k && frontier.nonEmpty) {
      val next = frontier.flatMap(u => und.getOrElse(u, Nil))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
      h += 1
    }
    dist
  }

  test("kHopDistances equals a reference BFS on arbitrary graphs") {
    for (((edges, seeds, k), i) <- sample(graphGen, seed = 41L, n = 5).zipWithIndex) {
      val got = Graph.kHopDistances(edges.toDF("s", "d"), col("s"), col("d"),
          seeds.toDF("id"), col("id"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refBfs(edges, seeds, k),
        s"case $i: edges=$edges seeds=$seeds k=$k")
    }
  }

  /** Hop-indexed reference BFS under per-hop label masks: state is
    * (node, hop) — NO visited-set pruning, because later hops speak a
    * different label language. */
  private def refLabeledBfs(edges: Seq[(Long, Long, String)], seeds: Seq[Long],
                            masks: Seq[Set[String]]): Map[Long, Long] = {
    val und = edges.filter { case (a, b, _) => a != b }
      .flatMap { case (a, b, l) => Seq((a, b, l), (b, a, l)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    var h = 0
    while (h < masks.size && frontier.nonEmpty) {
      val next = frontier.flatMap(u => und.getOrElse(u, Nil))
        .collect { case (v, l) if masks(h)(l) => v }
      dist = dist ++ next.filterNot(dist.contains).map(_ -> (h + 1L))
      frontier = next
      h += 1
    }
    dist
  }

  private val labeledGen: Gen[(Seq[(Long, Long, String)], Seq[Long], Seq[Set[String]])] =
    for {
      n <- Gen.chooseNum(4, 20)
      m <- Gen.chooseNum(3, 40)
      edges <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L),
        Gen.chooseNum(0L, n - 1L), Gen.oneOf("x", "y", "z")))
      nSeeds <- Gen.chooseNum(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.chooseNum(0L, n - 1L))
      k <- Gen.chooseNum(1, 4)
      masks <- Gen.listOfN(k, Gen.someOf("x", "y", "z").map(_.toSet)
        .suchThat(_.nonEmpty))
    } yield (edges, seeds.distinct, masks)

  test("kHopDistancesLabeled equals the hop-indexed reference on arbitrary graphs") {
    for (((edges, seeds, masks), i) <-
           sample(labeledGen, seed = 43L, n = 5).zipWithIndex) {
      val got = Graph.kHopDistancesLabeled(edges.toDF("s", "d", "l"),
          col("s"), col("d"), col("l"), seeds.toDF("id"), col("id"),
          masks.map(_.toSeq.sorted))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refLabeledBfs(edges, seeds, masks),
        s"case $i: edges=$edges seeds=$seeds masks=$masks")
    }
  }

  test("kHopDistancesLabeled with full masks reduces to kHopDistances") {
    for (((edges, seeds, k), i) <- sample(graphGen, seed = 47L, n = 3).zipWithIndex) {
      val lbl = edges.map { case (a, b) => (a, b, if ((a + b) % 2 == 0) "x" else "y") }
      val full = Graph.kHopDistancesLabeled(lbl.toDF("s", "d", "l"),
          col("s"), col("d"), col("l"), seeds.toDF("id"), col("id"),
          Seq.fill(k)(Seq("x", "y")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plain = Graph.kHopDistances(edges.toDF("s", "d"), col("s"), col("d"),
          seeds.toDF("id"), col("id"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(full == plain, s"case $i: edges=$edges seeds=$seeds k=$k")
    }
  }

  test("kHopDistancesLabeled re-expands an already-reached node at a later hop") {
    // path 1 -x- 2 -y- 3; node 2 is ALSO a seed. An anti-joined BFS
    // would never expand 2 at hop 2 (it is labeled at dist 0), losing
    // 3; hop-indexed states must find 3 at dist 2 via seed 1.
    val edges = Seq((1L, 2L, "x"), (2L, 3L, "y"))
    val got = Graph.kHopDistancesLabeled(edges.toDF("s", "d", "l"),
        col("s"), col("d"), col("l"), Seq(1L, 2L).toDF("id"), col("id"),
        Seq(Seq("x"), Seq("y")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 2L), s"got $got")
    // and the mask genuinely blocks: y-only on hop 1 reaches nothing new
    val blocked = Graph.kHopDistancesLabeled(edges.toDF("s", "d", "l"),
        col("s"), col("d"), col("l"), Seq(1L).toDF("id"), col("id"),
        Seq(Seq("y")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blocked == Map(1L -> 0L), s"got $blocked")
  }

  test("psiByGroup is non-negative on arbitrary snapshot pairs") {
    val snapGen: Gen[(Seq[Long], Seq[Long])] = for {
      a <- Gen.chooseNum(2, 15); b <- Gen.chooseNum(2, 15)
      o <- Gen.listOfN(a, Gen.chooseNum(1L, 500L))
      n <- Gen.listOfN(b, Gen.chooseNum(1L, 500L))
    } yield (o, n)
    for (((o, n), i) <- sample(snapGen, seed = 53L, n = 5).zipWithIndex) {
      val psi = Profile.psiByGroup(
          o.map(("g", _)).toDF("g", "v"), n.map(("g", _)).toDF("g", "v"),
          col("g"), col("v"))
        .collect().head.getAs[Double]("psi")
      assert(psi >= -1e-6,
        s"case $i: every (p-q)ln(p/q) term is >= 0; got $psi for $o vs $n")
    }
  }

  test("charClassMix classes partition the char count on arbitrary ASCII text") {
    val textGen: Gen[String] = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))
    val texts = sample(textGen, seed = 61L, n = 12)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextFunctions.charClassMix(col("text")).as("m"))
      .select(col("id"), col("m.*")).collect()
    for (r <- got) {
      val parts = Seq("n_letters", "n_digits", "n_spaces", "n_other")
        .map(r.getAs[Long](_)).sum
      assert(parts == r.getAs[Long]("n_chars"),
        s"classes must partition: ${texts(r.getAs[Long]("id").toInt)}")
    }
  }
}
