package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** C138 Neyman allocation: hand-computable apportionment, the N_h cap,
  * the zero-variance contract, and exact budget conservation.
  */
class NeymanSpec extends AnyFunSuite {
  import SparkTest._

  private def alloc(rows: Seq[(String, Long)], budget: Long) = {
    import spark.implicits._
    Curation.neymanAllocation(rows.toDF("src", "x"), col("src"), col("x"), budget)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
  }

  test("allocation follows N_h * S_h, conserves the budget exactly") {
    // a: 4 docs, values {0,0,10,10} -> sd 5; b: 4 docs {0,0,2,2} -> sd 1
    // weights 20 : 4 -> budget 12 splits 10 : 2
    val rows = Seq("a" -> 0L, "a" -> 0L, "a" -> 10L, "a" -> 10L,
      "b" -> 0L, "b" -> 0L, "b" -> 2L, "b" -> 2L)
    val got = alloc(rows, budget = 12)
    assert(got("a") == (4L, 4L), "Neyman allocation 10 caps at N_h = 4")
    assert(got("b") == (4L, 2L))
  }

  test("zero-variance strata get zero; budget still conserved via remainders") {
    val rows = Seq("c" -> 7L, "c" -> 7L, "c" -> 7L) ++       // sd 0
      (for (s <- Seq("d", "e"); v <- Seq(0L, 0L, 6L, 6L)) yield (s, v))
    val got = alloc(rows, budget = 5)
    assert(got("c")._2 == 0L, "a constant stratum earns no samples")
    // d and e split 5 as 2/3 or 3/2 — remainder tie broken by source asc
    assert(got("d")._2 + got("e")._2 == 5L)
    assert(got("d")._2 == 3L && got("e")._2 == 2L,
      "equal remainders break on source asc (d before e)")
  }

  test("temperature allocation up-samples small sources, conserves budget") {
    import spark.implicits._
    // sizes 9 : 1 -> α=0.5 weights 3 : 1 -> budget 100 splits 75 : 25
    val rows = Seq.fill(9)(("big", 1L)) ++ Seq(("small", 1L))
    val got = Curation.temperatureAllocation(rows.toDF("src", "sz"),
        col("src"), col("sz"), budget = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("big") == (9L, 75L))
    assert(got("small") == (1L, 25L),
      "a 10% source gets 25% of the budget at alpha = 0.5 — and may " +
        "exceed its own size (epoch repetition is the published contract)")
    assert(got.values.map(_._2).sum == 100L)
  }

  test("dyadic alpha: conservation holds and smaller alpha flattens harder") {
    import spark.implicits._
    val rows = Seq.fill(81)(("big", 1L)) ++ Seq(("small", 1L))
    def small(num: Int, log2den: Int): Long =
      Curation.temperatureAllocation(rows.toDF("src", "sz"),
          col("src"), col("sz"), budget = 1000L,
          alphaNum = num, alphaLog2Den = log2den)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
        .apply("small")
    // sizes 81 : 1 -> exact shares: alpha 1 -> 1/82; 3/4 -> 1/28;
    // 1/2 -> 1/10; 1/4 -> 1/4 (81^(1/4) = 3)
    val byAlpha = Seq(
      small(1, 0),   // alpha = 1
      small(3, 2),   // alpha = 3/4
      small(1, 1),   // alpha = 1/2
      small(1, 2))   // alpha = 1/4
    assert(byAlpha == Seq(12L, 36L, 100L, 250L),
      s"hand-computed shares at sizes 81:1, budget 1000: $byAlpha")
    // conservation at every alpha
    for ((num, den) <- Seq((1, 0), (3, 2), (1, 1), (1, 2), (3, 4))) {
      val tot = Curation.temperatureAllocation(rows.toDF("src", "sz"),
          col("src"), col("sz"), budget = 1000L,
          alphaNum = num, alphaLog2Den = den)
        .agg(sum(col("alloc"))).collect().head.getLong(0)
      assert(tot == 1000L, s"budget conserved at alpha $num/2^$den")
    }
  }

  test("all-constant strata (T = 0) allocate zero everywhere") {
    // every stratum has sd 0 -> total weight 0: the budget is left
    // unspent rather than handed +1-by-+1 to the first names
    val rows = Seq("p" -> 5L, "p" -> 5L, "q" -> 9L, "q" -> 9L)
    val got = alloc(rows, budget = 7)
    assert(got("p")._2 == 0L && got("q")._2 == 0L,
      "T = 0 must not spray the budget over zero-information strata")
  }

  test("largest-remainder hands out exactly budget - sum(floors)") {
    // three equal 4-doc strata, budget 10: floors 3/3/3, one +1 by
    // remainder (strata must hold >= 4 docs or the N_h cap bites)
    val rows = for (s <- Seq("x", "y", "z"); v <- Seq(0L, 0L, 4L, 4L)) yield (s, v)
    val got = alloc(rows, budget = 10)
    assert(got.values.map(_._2).sum == 10L)
    assert(got.values.map(_._2).toSeq.sorted == Seq(3L, 3L, 4L))
  }
}
