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
