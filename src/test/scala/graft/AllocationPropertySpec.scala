package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Property coverage for the exact-apportionment family
  * (temperature/recency allocation, curriculum staging): example
  * specs pin hand-computed cases; this pins the space between them —
  * conservation, quota bounds against exact rationals, and the
  * invariances the integer formulations promise. (Raw scalacheck
  * generators under fixed seeds, the RoutingPropertySpec recipe.)
  */
class AllocationPropertySpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** 2..8 sources with positive sizes across 6 orders of magnitude. */
  private val sizesGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.chooseNum(2, 8)
    sz <- Gen.listOfN(n, Gen.chooseNum(1L, 1000000L))
  } yield sz.zipWithIndex.map { case (s, i) => (s"src$i", s) }

  test("temperatureAllocation at alpha=1: conservation + exact quota bounds") {
    for ((rows, i) <- sample(sizesGen, seed = 7L, n = 6).zipWithIndex) {
      val budget = 1000L + 37L * i
      val got = Curation.temperatureAllocation(rows.toDF("src", "sz"),
          col("src"), col("sz"), budget, alphaNum = 1, alphaLog2Den = 0)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.values.map(_._2).sum == budget, s"conservation, case $i")
      // alpha=1 weights are exactly size*1e6, so the true quota is the
      // exact rational budget*size/total — alloc must be its floor or
      // ceiling (the largest-remainder guarantee)
      val total = rows.map(_._2).sum
      for ((src, sz) <- rows) {
        val q = (BigInt(budget) * sz / total).toLong
        val a = got(src)._2
        assert(a == q || a == q + 1,
          s"case $i $src: alloc $a outside {$q, ${q + 1}} (size $sz / $total)")
      }
    }
  }

  test("temperatureAllocation at dyadic alphas: conservation + size-monotonicity") {
    for {
      (rows, i) <- sample(sizesGen, seed = 11L, n = 4).zipWithIndex
      (num, den) <- Seq((1, 1), (3, 2), (1, 2))
    } {
      val got = Curation.temperatureAllocation(rows.toDF("src", "sz"),
          col("src"), col("sz"), budget = 5000L,
          alphaNum = num, alphaLog2Den = den)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.values.map(_._2).sum == 5000L,
        s"conservation, case $i alpha $num/2^$den")
      // a bigger source never allocates more than 1 below a smaller
      // one (weights are monotone in size; floors are monotone; the
      // +1 remainder can flip at most one unit)
      for (Seq((sa, za), (sb, zb)) <- rows.combinations(2).map(_.toSeq)) {
        val (hi, lo) = if (za >= zb) (sa, sb) else (sb, sa)
        assert(got(hi)._2 >= got(lo)._2 - 1,
          s"case $i alpha $num/2^$den: size-monotonicity $hi vs $lo")
      }
    }
  }

  test("recencyAllocation: invariant to shifting every timestamp") {
    val evGen: Gen[Seq[(String, Long)]] = for {
      n <- Gen.chooseNum(3, 20)
      ev <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0L, 500L)))
    } yield ev
    for ((rows, i) <- sample(evGen, seed = 23L, n = 5).zipWithIndex) {
      def alloc(shift: Long) =
        Curation.recencyAllocation(
            rows.map { case (g, t) => (g, t + shift) }.toDF("grp", "us"),
            col("grp"), col("us"), budget = 100L, halflifeUs = 50L)
          .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(alloc(0L) == alloc(1234567L),
        s"case $i: ages are relative to max — a global shift changes nothing")
    }
  }

  test("curriculumStages: pos is a permutation, stages are a monotone partition") {
    val docsGen: Gen[Seq[(Long, Long, Long)]] = for {
      n <- Gen.chooseNum(2, 24)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 200L), Gen.chooseNum(0L, 4L)))
    } yield rows.zipWithIndex.map { case ((tk, lv), i) => (i.toLong, tk, lv) }
    for ((rows, i) <- sample(docsGen, seed = 31L, n = 5).zipWithIndex) {
      val nStages = 3
      val got = Curation.curriculumStages(rows.toDF("id", "toks", "lvl"),
          col("id"), col("toks"), col("lvl"), nStages)
        .orderBy(col("pos")).collect()
      val n = rows.length
      assert(got.map(_.getAs[Long]("pos")).toSeq == (1L to n).map(identity),
        s"case $i: pos is the 1..n permutation index")
      val stages = got.map(_.getAs[Long]("stage")).toSeq
      assert(stages == stages.sorted, s"case $i: stages non-decreasing along pos")
      assert(stages.forall(st => st >= 0 && st < nStages), s"case $i: stage range")
      val lvls = got.map(_.getAs[Long]("level")).toSeq
      assert(lvls == lvls.sorted, s"case $i: levels ordered along the curriculum")
      assert(got.map(_.getAs[Long]("n_tokens")).sum == rows.map(_._2).sum,
        s"case $i: token mass preserved")
    }
  }
}
