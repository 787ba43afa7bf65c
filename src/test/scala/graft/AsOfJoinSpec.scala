package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin
import graft.operators.Analytics

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTest._

  test("picks greatest right time <= left time, ties broken by greatest tiebreak") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val left = Seq((1L, 100L), (1L, 50L), (2L, 10L), (3L, 100L)).toDF("k", "t")
    val right = Seq(
      (1L, 40L, 900L), (1L, 90L, 901L), (1L, 90L, 902L), (1L, 120L, 903L),
      (2L, 20L, 904L)).toDF("k2", "t2", "v")
    val got = AsOfJoin.join(left, right, "k", "k2", "t", "t2", Seq("v"))
      .select("k", "t", "t2", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.toSeq == Seq(
      (1L, 50L, 40L, 900L),   // only t2=40 <= 50
      (1L, 100L, 90L, 902L)   // ties at t2=90 → greatest v wins
      // k=2: t=10 has no t2<=10 → dropped (inner)
      // k=3: no right rows → dropped
    ))
  }

  test("null keys never match (SQL equi-join semantics) and null times drop") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val left = Seq(
      (Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None)
    ).toDF("k", "t")
    val right = Seq(
      (Some(1L), Some(40L), 900L), (None, Some(40L), 666L), (Some(1L), None, 667L)
    ).toDF("k2", "t2", "v")
    val got = AsOfJoin.join(left, right, "k", "k2", "t", "t2", Seq("v"))
      .select("k", "t", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // only the non-null (1, 100) left row matches, and only the non-null
    // right row can be its match — null keys on either side never pair up
    assert(got == Seq((1L, 100L, 900L)))
  }

  test("mismatched key types are rejected, not compared byte-wise") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1, 40L, 900L)).toDF("k2", "t2", "v") // k2 is INT, not BIGINT
    val ex = intercept[Exception] {
      AsOfJoin.join(left, right, "k", "k2", "t", "t2", Seq("v")).collect()
    }
    assert(ex.getMessage.contains("key types must match"), ex.getMessage)
  }

  test("custom operator agrees with the window-based composition on sf0.001") {
    GraftExtensions.ensureRegistered(spark)
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows("q13b_asof_custom") == rows("q13_asof_join"))
    assert(rows("q13b_asof_custom").nonEmpty)
  }

  test("tolerance bounds the lookback: latest-but-stale rows stop matching") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 100L)).toDF("lk", "lt")
    val r = Seq((1L, 10L), (1L, 60L), (2L, 5L)).toDF("rk", "rt")
    def ids(tol: Option[Long]) = graft.plans.AsOfJoin
      .join(l, r, "lk", "rk", "lt", "rt", toleranceUs = tol)
      .select("lk", "rt").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // unbounded: k=1 matches rt=60 (latest ≤ 100), k=2 matches rt=5
    assert(ids(None) == Set((1L, 60L), (2L, 5L)))
    // tolerance 50: k=1 gap 40 ok; k=2 gap 95 too stale — no fallback to
    // even-older rows, the row simply doesn't match
    assert(ids(Some(50L)) == Set((1L, 60L)))
    // tolerance 10: nothing within bound
    assert(ids(Some(10L)) == Set.empty)
  }

  test("concurrent ensureRegistered leaves exactly one AsOfJoinStrategy") {
    import java.util.concurrent.{CountDownLatch, Executors}
    val threads = 8
    val pool = Executors.newFixedThreadPool(threads)
    val go = new CountDownLatch(1)
    try {
      val futures = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = { go.await(); GraftExtensions.ensureRegistered(spark) }
        })
      }
      go.countDown() // all threads hit the check-then-append together
      futures.foreach(_.get())
    } finally pool.shutdown()
    val n = spark.experimental.extraStrategies
      .count(_ eq graft.plans.AsOfJoinStrategy)
    assert(n == 1, s"strategy registered $n times")
  }

  test("physical plan is the custom exec with one shuffle+sort per side") {
    GraftExtensions.ensureRegistered(spark)
    val df = Analytics.q13b.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan.take(1500)) // exec prints without the Exec suffix
    assert(!plan.contains("SortMergeJoin"), "should use the native exec, not a join+window")
  }
}
