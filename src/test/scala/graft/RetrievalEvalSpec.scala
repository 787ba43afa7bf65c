package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Keywords
import graft.operators.Profile

/** Hand fixtures for the round-12 eval additions: MRR@k (C145) and
  * the cross-source duplication matrix (C146).
  */
class RetrievalEvalSpec extends AnyFunSuite {
  import SparkTest._

  test("mrrAtK: integer reciprocals, misses count in the denominator") {
    import spark.implicits._
    // q1 hits its relevant doc at rank 2, q2 at rank 1, q3 never
    val ranked = Seq(
      (1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 102L),
      (2L, 1L, 200L),
      (3L, 1L, 300L), (3L, 2L, 301L))
      .toDF("query_id", "rank", "doc_id")
    val relevant = Seq((1L, 101L), (2L, 200L), (3L, 999L))
      .toDF("query_id", "doc_id")
    val got = Keywords.mrrAtK(ranked, relevant).collect().head
    assert(got.getAs[Long]("n_queries") == 3L)
    assert(got.getAs[Long]("n_hit") == 2L)
    // (500000 + 1000000 + 0) / 3 / 1e6 = 0.5
    assert(got.getAs[Double]("mrr") == 0.5)
  }

  test("mrrAtK: first relevant hit wins when several are ranked") {
    import spark.implicits._
    val ranked = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("query_id", "rank", "doc_id")
    val relevant = Seq((1L, 12L), (1L, 11L)).toDF("query_id", "doc_id")
    val got = Keywords.mrrAtK(ranked, relevant).collect().head
    assert(got.getAs[Double]("mrr") == 0.5, "min rank (2) scores, not rank 3")
  }

  test("crossSourceDupMatrix: canonical pairs, hand-checked rates") {
    import spark.implicits._
    // sources: A = {1, 2, 3}, B = {4, 5}
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"))
      .toDF("doc_id", "source")
    // dup pairs: (1,2) within A; (3,4) and (5,2) across — both must
    // canonicalize to (A, B) regardless of doc order
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 2L)).toDF("doc_a", "doc_b")
    val got = Profile.crossSourceDupMatrix(pairs, docs, col("doc_id"), col("source"))
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("pair_rate"))).toMap
    // A-A: 1 pair of 3*2/2 = 3 possible; A-B: 2 of 3*2 = 6 possible
    assert(got(("A", "A")) == ((1L, 0.333333333)))
    assert(got(("A", "B")) == ((2L, 0.333333333)))
    assert(!got.contains(("B", "B")), "no B-internal pairs, no row")
  }
}
