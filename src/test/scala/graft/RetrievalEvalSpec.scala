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

  test("matryoshkaRecallCurve: a misleading prefix scores below full recall") {
    import spark.implicits._
    // query q = (1, 0, 0, 0). Full-dim nearest is A (same direction).
    // The 2-dim prefix of B is identical to A's, but B's tail points
    // away — at d=2 both A and B tie perfectly while at full dim only
    // A is near. k=1: prefix search may pick B (tie on cosine breaks
    // by id: A=1 wins) — so construct B with a BETTER prefix: B's
    // prefix aligns more than A's.
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // A: true nearest
      (2L, Array(1.0f, 0.0f, 0.9f, 0.9f)),   // B: perfect 2-prefix, bad tail
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))  // far everywhere
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.matryoshkaRecallCurve(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), dims = Seq(2, 4), k = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    assert(got(4L) == 1.0, "full-dim search against full-dim truth is exact")
    assert(got(2L) == 0.0,
      s"the 2-dim prefix ranks B (perfect prefix) over A: recall 0 at k=1: $got")
  }

  test("ivfTopKTruncated: truncated probe, full-dim final ranking") {
    import spark.implicits._
    // two cells split on the 2-dim prefix; within the query's cell the
    // FULL-dim order disagrees with the prefix order — the re-rank
    // must decide by full dim (B over A), proving the truncation
    // stops at the candidate boundary
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.9f), 0L),   // A: perfect prefix, bad tail
      (2L, Array(0.9f, 0.1f, 0.0f, 0.05f), 0L),  // B: good prefix, right tail
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1L))  // other cell
      .toDF("vec_id", "embedding", "cell")
    val queries = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.ivfTopKTruncated(
        corpus, col("vec_id"), col("embedding"), col("cell"),
        queries, col("vec_id"), col("embedding"),
        prefixDims = 2, k = 1, nprobe = 1)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("neighbor_id") == 2L,
      s"full-dim re-rank prefers B despite A's perfect 2-dim prefix: " +
        got.mkString(","))
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
