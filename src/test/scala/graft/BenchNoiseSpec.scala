package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise gate (D11's record-integrity half): a sweep taken
  * under heavy host contention must never silently become the record
  * of note — the gate marks it `"noisy": true` when the MEDIAN
  * per-query pass spread crosses [[Bench.NoisySpreadBound]]. Pure
  * function, spec'd without a session.
  */
class BenchNoiseSpec extends AnyFunSuite {

  test("median spread: odd/even counts, sentinel exclusion, empty") {
    assert(Bench.spreadMedian(Seq(1.0, 3.0, 2.0)) == 2.0)
    assert(Bench.spreadMedian(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    // -1 sentinels (failed queries / min<=0) are excluded, not counted
    // as tiny spreads that would drag the median under the bound
    assert(Bench.spreadMedian(Seq(-1.0, 5.0, -1.0, 7.0)) == 6.0)
    assert(Bench.spreadMedian(Seq.empty) == -1.0)
    assert(Bench.spreadMedian(Seq(-1.0)) == -1.0)
  }

  test("the gate trips on a contended sweep, not on one contested query") {
    // a healthy interleaved sweep: most spreads near 1, a few contested
    val healthy = Seq.fill(60)(1.1) ++ Seq(4.2, 31.3, 37.4)
    assert(Bench.spreadMedian(healthy) <= Bench.NoisySpreadBound,
      "scheduling jitter on a minority of queries must not read as noise")
    // the r14 failure mode: a contended host inflates MOST queries
    val contended = Seq.fill(30)(1.2) ++ Seq.fill(40)(3.0) ++ Seq(31.3, 37.4)
    assert(Bench.spreadMedian(contended) > Bench.NoisySpreadBound,
      "a majority-contested sweep must trip the gate")
  }
}
