package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Graph}

/** Hand fixtures for recency-weighted allocation (C147) and bounded
  * k-hop BFS (C148).
  */
class RecencyKhopSpec extends AnyFunSuite {
  import SparkTest._

  test("recencyAllocation: one half-life halves the weight exactly") {
    import spark.implicits._
    // fresh: 2 events at t=100 (age 0 -> w 2^16 each)
    // stale: 4 events one half-life back (age 1 -> w 2^15 each)
    // weights 2*65536 : 4*32768 = 1:1 -> budget 10 splits 5/5
    val rows = Seq(("fresh", 100L), ("fresh", 100L),
      ("stale", 90L), ("stale", 90L), ("stale", 90L), ("stale", 90L))
    val got = Curation.recencyAllocation(rows.toDF("grp", "us"),
        col("grp"), col("us"), budget = 10L, halflifeUs = 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("fresh") == ((2L, 5L)),
      "2 fresh events outweigh-per-event 4 one-half-life-old ones into a tie")
    assert(got("stale") == ((4L, 5L)))
  }

  test("recencyAllocation: beyond the cap weighs exactly zero; NULL ts too") {
    import spark.implicits._
    val rows = Seq(("live", Option(100L)), ("dead", Option(0L)),
      ("unknown", Option.empty[Long]))
    val got = Curation.recencyAllocation(rows.toDF("grp", "us"),
        col("grp"), col("us"), budget = 7L, halflifeUs = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("live" -> 7L, "dead" -> 0L, "unknown" -> 0L),
      "age 100 >= 16 half-lives and NULL ts both carry zero weight")
  }

  test("kHopDistances: exact BFS layers on a path graph plus isolation") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7, seed {1}; node 9-10 disconnected
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (9L, 10L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.kHopDistances(edges, col("s"), col("d"),
        seeds, col("id"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"exactly the <= 3-hop layer set; unreached/disconnected absent: $got")
  }

  test("kHopDistances: min distance wins on multiple paths; early exhaustion stops") {
    import spark.implicits._
    // triangle 1-2-3 plus 3-4: node 3 is 1 hop via the direct edge,
    // not 2 via 1-2-3; k = 10 exhausts the frontier after 2 rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.kHopDistances(edges, col("s"), col("d"),
        Seq(1L).toDF("id"), col("id"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }
}
