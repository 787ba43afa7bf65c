package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.streaming.DropStats

/** C137 dedup report + A17 seasonal residuals: hand-computable
  * fixtures pinning the keep-min byte attribution and the
  * previous-season baseline semantics.
  */
class DedupReportSpec extends AnyFunSuite {
  import SparkTest._

  test("dedup report attributes bytes to the keep-min survivor per cluster") {
    import spark.implicits._
    // cluster {1,2,3} (keep 1), cluster {10,11} (keep 10), singletons 20, 21
    val corpus = Seq((1L, 100L), (2L, 50L), (3L, 25L),
      (10L, 7L), (11L, 9L), (20L, 3L), (21L, 4L)).toDF("doc_id", "n_bytes")
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val got = Curation.dedupReport(corpus, col("doc_id"), col("n_bytes"), members)
      .orderBy(col("cluster_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 0L, 7L, 0L),      // two singletons, nothing dropped
      (2L, 1L, 2L, 1L, 16L, 9L),     // {10,11}: keep 10 (7 B), drop 9 B
      (3L, 1L, 3L, 2L, 175L, 75L)))  // {1,2,3}: keep 1 (100 B), drop 75 B
  }

  test("shard manifest is partitioning-independent and detects a swapped doc") {
    import spark.implicits._
    val packed = Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 5L, 1L))
      .toDF("doc_id", "n_tokens", "shard")
    def m(df: org.apache.spark.sql.DataFrame) =
      Curation.shardManifest(df).orderBy(col("shard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val base = m(packed)
    assert(m(packed.repartition(7, col("n_tokens"))) == base,
      "checksums must not depend on row order or partitioning")
    // swapping which doc sits in shard 0 changes its checksum even
    // though counts and token totals stay identical
    val swapped = Seq((2L, 10L, 0L), (1L, 20L, 0L), (3L, 5L, 1L))
      .toDF("doc_id", "n_tokens", "shard")
    val sw = m(swapped)
    assert(sw.head._2 == base.head._2 && sw.head._3 == base.head._3)
    assert(sw.head._4 == base.head._4,
      "same doc SET -> same checksum (content-addressed, not position)")
    val moved = Seq((1L, 10L, 0L), (4L, 20L, 0L), (3L, 5L, 1L))
      .toDF("doc_id", "n_tokens", "shard")
    assert(m(moved).head._4 != base.head._4,
      "a different doc set must change the checksum")
  }

  test("seasonal residuals: first season NULL, burst flags, echo flags negative") {
    import spark.implicits._
    // group g, lag 10: buckets 0-49 at 5/bucket, except bucket 12
    // bursts to 50 — residuals are 0 everywhere but +45 at 12 and the
    // -45 echo at 22 (40 residuals: sd ≈ 10, 3σ ≈ 30 < 45)
    val rows =
      for (b <- 0L until 50L; _ <- 0 until (if (b == 12) 50 else 5))
        yield ("g", b)
    val got = DropStats.seasonalResiduals(rows.toDF("grp0", "b"),
        col("grp0"), col("b"), lag = 10L, k = 3.0)
      .orderBy(col("bucket")).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(7)) None else Some(r.getBoolean(7))))
      .toMap
    for (b <- 0L until 10L)
      assert(got(b).isEmpty, s"bucket $b has no previous season: NULL verdict")
    assert(got(12L) == Some(true), "the 5 -> 50 burst must flag")
    assert(got(22L) == Some(true), "the 50 -> 5 echo a season later must flag")
    for (b <- Seq(10L, 11L, 13L, 23L, 49L))
      assert(got(b) == Some(false), s"flat bucket $b must not flag")
  }
}
