package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DropStats

/** A16 CUSUM level-shift detection: the closed form must equal the
  * textbook sequential recurrence, reset after dips, and flag persistent
  * small drifts a spike rule misses.
  */
class CusumSpec extends AnyFunSuite {
  import SparkTest._

  /** (group, bucket) rows with `n` copies each — cusumShift counts. */
  private def series(groups: Map[String, Seq[Long]]) = {
    import spark.implicits._
    groups.toSeq.flatMap { case (g, ns) =>
      ns.zipWithIndex.flatMap { case (n, b) =>
        Seq.fill(n.toInt)((g, b.toLong))
      }
    }.toDF("grp0", "bucket0")
  }

  private def run(groups: Map[String, Seq[Long]], slack: Long, threshold: Long) =
    DropStats.cusumShift(series(groups), col("grp0"), col("bucket0"),
        slack, threshold)
      .orderBy(col("grp"), col("bucket"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(5)))

  /** Reference implementation: the sequential textbook recurrence. */
  private def cusumRef(ns: Seq[Long], slack: Long): Seq[Long] = {
    val ref = ns.sum / ns.length
    ns.scanLeft(0L)((s, n) => math.max(0L, s + n - ref - slack)).tail
  }

  test("closed form equals the sequential recurrence on a noisy series") {
    val ns = Seq[Long](5, 7, 3, 6, 9, 2, 5, 8, 4, 6, 12, 11, 13, 12, 14, 3, 5)
    val got = run(Map("a" -> ns), slack = 1, threshold = 10)
    val want = cusumRef(ns, slack = 1)
    assert(got.map(_._4).toSeq == want,
      s"closed-form cusum ${got.map(_._4).toSeq} != recurrence $want")
    assert(got.map(_._5).toSeq == want.map(_ >= 10))
  }

  test("a persistent +2 drift flags even though no single bucket spikes") {
    // mean of the whole series is pulled up by the drifted tail, but
    // every bucket stays within ±3 of it — a 2σ spike rule is silent
    val flat = Seq.fill(20)(10L)
    val drift = Seq.fill(20)(12L)
    val got = run(Map("d" -> (flat ++ drift)), slack = 0, threshold = 8)
    assert(got.takeWhile(!_._5).nonEmpty, "must not flag from bucket 0")
    assert(got.last._5, "accumulated drift must cross the threshold")
    // and the flat twin never flags
    val flatOnly = run(Map("f" -> Seq.fill(40)(10L)), slack = 0, threshold = 8)
    assert(flatOnly.forall(!_._5))
  }

  test("the running-min reset matches max(0, ...) clamping after a dip") {
    // deep dip then recovery: a naive P_i - min(P) without the 0-clamp
    // would credit the dip as negative state and over-report later
    val ns = Seq[Long](10, 1, 1, 1, 10, 10, 10, 10)
    val got = run(Map("r" -> ns), slack = 0, threshold = 100)
    assert(got.map(_._4).toSeq == cusumRef(ns, slack = 0))
  }

  test("groups accumulate independently") {
    val got = run(Map(
      "hot"  -> (Seq.fill(5)(4L) ++ Seq.fill(10)(9L)),
      "cold" -> Seq.fill(15)(4L)), slack = 0, threshold = 6)
    val byGrp = got.groupBy(_._1)
    assert(byGrp("hot").exists(_._5))
    assert(byGrp("cold").forall(!_._5))
  }
}
