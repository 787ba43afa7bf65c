package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

object SparkTest {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class AnalyticsSpec extends AnyFunSuite {
  import SparkTest._

  for (q <- Analytics.all) {
    test(s"${q.name} runs and returns rows") {
      assert(q.fn(spark, sf).count() > 0)
    }
  }

  test("resampleFfill: calendar completion, forward-fill, leading-gap NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // user 1 observes buckets 10 and 13 (gap 11, 12); user 2 only 20.
    val df = Seq((1L, 10L * 100L, 2.0), (1L, 10L * 100L + 5L, 3.0),
      (1L, 13L * 100L, 7.0), (2L, 20L * 100L, 1.0))
      .toDF("uid", "us", "v")
    val got = Analytics.resampleFfill(df, col("uid"), col("us"), col("v"), 100L)
      .orderBy(col("k"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, Some(5.0), 5.0, false),
      (1L, 11L, None, 5.0, true),   // gap carried forward
      (1L, 12L, None, 5.0, true),
      (1L, 13L, Some(7.0), 7.0, false),
      (2L, 20L, Some(1.0), 1.0, false)), s"got ${got.toSeq}")
  }

  test("readability: hand-computed Flesch counts and NULL-text honesty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val df = Seq((1L, "The cat sat. The dog ran!"), (2L, null: String))
      .toDF("doc_id", "text")
    val m = TextFunctions.readability(col("text"))
    val r = df.select(col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id")).collect()
    // 6 words, 2 sentence runs, syllable groups: e/a/a/e/o/a = 6
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((6L, 2L, 6L)))
    val flesch = r(0).getDouble(4)
    assert(math.abs(flesch - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9)
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && r(1).isNullAt(4),
      "NULL text must yield NULL measures, not fabricated counts")
  }

  test("saltedJoin is row-for-row the plain join, including duplicate keys") {
    import spark.implicits._
    val probe = Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 12L, "c"), (9L, 13L, "d"))
      .toDF("k", "rid", "pv")
    val build = Seq((1L, "x"), (1L, "y"), (2L, "z"))
      .toDF("k", "bv") // dup build key: join multiplicity must survive salting
    val plain = probe.join(build, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sorted.toSeq
    val salted = graft.operators.Skew.saltedJoin(probe, build, "k",
        org.apache.spark.sql.functions.col("rid"), salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin rejects salts < 1 at call time") {
    import spark.implicits._
    val probe = Seq((1L, 10L)).toDF("k", "rid")
    val build = Seq((1L, "x")).toDF("k", "bv")
    // salts=0 would pmod-by-zero at runtime (ANSI error) deep inside a
    // job; the require turns it into an immediate call-site failure
    val e = intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(probe, build, "k",
        org.apache.spark.sql.functions.col("rid"), salts = 0)
    }
    assert(e.getMessage.contains("salts"))
    // the degenerate-but-legal salts=1 is still row-for-row the plain join
    val one = graft.operators.Skew.saltedJoin(probe, build, "k",
        org.apache.spark.sql.functions.col("rid"), salts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(one == Seq((1L, 10L, "x")))
  }

  test("q18's join rewrite keeps NULL-key rows exactly as the window form does") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, sum}
    // TPC-H brands are non-null, so the oracle can't see this class;
    // construct the missing-key corpus the rewrite must not diverge on
    val parts = Seq(
      (Some("B1"), 10.0), (Some("B1"), 20.0), (Some("B1"), 30.0),
      (None, 5.0), (None, 15.0), (None, 25.0))
      .toDF("p_brand", "p_retailprice")
    def results(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the window form the oracle SQL uses: PARTITION BY groups NULLs
    val windowed = parts
      .withColumn("brand_avg",
        sum(col("p_retailprice")).over(Window.partitionBy(col("p_brand"))) /
          count(lit(1)).over(Window.partitionBy(col("p_brand"))))
      .filter(col("p_retailprice") > col("brand_avg"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_above"))
    // the registered rewrite: groupBy + null-safe broadcast join-back
    val brandAvg = parts.groupBy(col("p_brand"))
      .agg((sum(col("p_retailprice")) / count(lit(1))).as("brand_avg"))
      .withColumnRenamed("p_brand", "b_brand")
    val rewritten = parts
      .join(broadcast(brandAvg), col("p_brand") <=> col("b_brand"))
      .filter(col("p_retailprice") > col("brand_avg"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_above"))
    assert(results(windowed) == results(rewritten))
    assert(results(rewritten).contains(None), "NULL-brand group dropped by the join")
    // and the null-safe key must not demote the broadcast hash join
    assert(rewritten.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("q10b approx percentiles land near the exact per-group values") {
    val exact = Analytics.q10.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Analytics.q10b.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    // percentile_approx at accuracy 10000 on these group sizes is
    // rank-exact up to interpolation: the sketch returns a REAL data
    // value, the exact percentile interpolates between two — bound by
    // the local value spacing, generously 5% of the exact value scale
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) <= math.abs(e50) * 0.05 + 1e-6, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= math.abs(e90) * 0.05 + 1e-6, s"$k p90: $a90 vs $e90")
    }
  }

  test("q16 approx distinct within 5% of exact") {
    val exact = Analytics.q16.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Analytics.q16b.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  test("q01 pushes the shipdate filter into the parquet scan") {
    val plan = executedPlan(Analytics.q01.fn(spark, sf)).toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
  }

  test("q01 prunes columns: scan reads only needed lineitem columns") {
    val plan = executedPlan(Analytics.q01.fn(spark, sf)).toString
    assert(!plan.contains("l_orderkey"), "unused column not pruned from scan")
  }

  test("q02 broadcasts the dim tables") {
    val plan = executedPlan(Analytics.q02.fn(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q01 stays inside whole-stage codegen") {
    // With AQE the codegen stages only materialize in the final plan,
    // so execute first and inspect the post-adaptive executedPlan.
    val df = Analytics.q01.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // toString renders WholeStageCodegen stages as "*(n)" prefixes.
    assert(plan.contains("*("), plan.take(2000))
  }

  test("q30 plans the range join as a cell equi-join with a pruned events scan") {
    val plan = executedPlan(Analytics.q30.fn(spark, sf)).toString
    // the whole point of the cell blocking: a big×big BETWEEN join that
    // never falls back to a nested loop or cartesian
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
    assert(plan.contains("__cell"), "cell-blocked equi join key missing from plan")
    // events carries (event_id, ts, user_id, event_type, value, props);
    // q30 needs only the first three — the scan must not read the rest
    assert(!plan.contains("props") && !plan.contains("event_type"),
      "unused events columns not pruned from scan")
  }

  test("q19 salting produces a two-stage aggregation over (key, salt)") {
    val df = Analytics.q19.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pmod"), "salt expression missing from plan")
    // two HashAggregate pairs: (partial+final) × two stages
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan.take(1500))
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("interval join: boundary semantics, single emission per multi-cell pair, guards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, 0L, 50L), (2L, 100L, 130L), (3L, 200L, 210L))
      .toDF("id", "s", "e")
    val b = Seq((10L, 45L, 60L),  // overlaps 1 by [45,50) = 5
                (11L, 50L, 70L),  // touches 1 at 50: half-open ⇒ NO overlap
                (12L, 0L, 300L),  // spans everything: overlaps 1, 2, 3
                (13L, 129L, 131L) // overlaps 2 by [129,130) = 1
      ).toDF("id", "s", "e")
    val got = graft.operators.Analytics.intervalJoin(
        a, col("id"), col("s"), col("e"),
        b, col("id"), col("s"), col("e"), cellWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each pair exactly ONCE even when it shares many cells (1×12
    // share 5 cells, 12 spans 30)
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set((1L, 10L, 5L), (1L, 12L, 50L), (2L, 12L, 30L),
      (3L, 12L, 10L), (2L, 13L, 1L)), s"got ${got.toSet}")
    // end <= start is a swapped-columns bug, not an empty result
    val bad = Seq((1L, 5L, 5L)).toDF("id", "s", "e")
    assertThrows[Exception] {
      graft.operators.Analytics.intervalJoin(
        bad, col("id"), col("s"), col("e"),
        b, col("id"), col("s"), col("e"), cellWidth = 10L).count()
    }
    // a span past maxCellsPerRow fails fast instead of exploding
    val wide = Seq((1L, 0L, 10000L)).toDF("id", "s", "e")
    assertThrows[Exception] {
      graft.operators.Analytics.intervalJoin(
        wide, col("id"), col("s"), col("e"),
        b, col("id"), col("s"), col("e"), cellWidth = 10L,
        maxCellsPerRow = 8).count()
    }
  }

  test("point-in-interval join: inclusive bounds, one emission per pair, payload carried") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pts = Seq((1L, 10L, "p1"), (2L, 30L, "p2"), (3L, 31L, "p3"))
      .toDF("pid", "t", "ptag")
    val ivs = Seq((10L, 10L, 30L, "A"),  // inclusive both ends: catches t=10 AND t=30
                  (11L, 0L, 95L, "B"),   // spans 10 cells: each pair still once
                  (12L, 32L, 40L, "C")   // catches nothing
      ).toDF("iid", "lo", "hi", "itag")
    val got = graft.operators.Analytics.pointInIntervalJoin(
        pts, "t", ivs, "lo", "hi", cellWidth = 10L)
      .select(col("pid"), col("iid"), col("ptag"), col("itag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set((1L, 10L, "p1", "A"), (2L, 10L, "p2", "A"),
      (1L, 11L, "p1", "B"), (2L, 11L, "p2", "B"), (3L, 11L, "p3", "B")),
      s"got ${got.toSet}")
    // hi < lo is a swapped-columns bug, not an empty result
    val bad = Seq((9L, 50L, 40L, "X")).toDF("iid", "lo", "hi", "itag")
    assertThrows[Exception] {
      graft.operators.Analytics.pointInIntervalJoin(
        pts, "t", bad, "lo", "hi", cellWidth = 10L).count()
    }
    // a span past maxCellsPerRow fails fast instead of exploding
    val wide = Seq((9L, 0L, 100000L, "X")).toDF("iid", "lo", "hi", "itag")
    assertThrows[Exception] {
      graft.operators.Analytics.pointInIntervalJoin(
        pts, "t", wide, "lo", "hi", cellWidth = 10L, maxCellsPerRow = 8).count()
    }
  }

  test("motif counting is contiguous, ordered, and repeat-aware") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // back-to-back repeats count twice; an intervening event breaks the
    // run; out-of-order stages never match
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (1L, 5L, "click"), (1L, 6L, "purchase"), // u1: 2 motifs
      (2L, 1L, "view"), (2L, 2L, "error"), (2L, 3L, "click"),
      (2L, 4L, "purchase"),                                      // u2: broken run
      (3L, 1L, "purchase"), (3L, 2L, "click"), (3L, 3L, "view")) // u3: reversed
      .map { case (u, t, ty) => (u, t * 1000000L, ty) }
    val df = rows.toDF("user_id", "ts_us", "event_type")
      .withColumn("event_id", col("user_id") * 100 + col("ts_us"))
    val got = df.groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")), ",").as("seq"))
      .select(col("user_id"),
        (size(split(col("seq"), "view,click,purchase", -1)) - 1).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 0L), s"got $got")
  }

  test("funnel advances only on strictly-later stages, in order") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: purchase BEFORE click — depth stops at click
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      // u3: click at the SAME instant as view — strict > blocks it
      (3L, "view", 10L), (3L, "click", 10L),
      // u4: never entered (no view) — absent from the output
      (4L, "click", 10L), (4L, "purchase", 20L),
      // u5: two views; the funnel anchors on the EARLIEST
      (5L, "view", 50L), (5L, "view", 10L), (5L, "click", 20L)
    ).toDF("u", "et", "tu")
    val got = graft.operators.Analytics.funnel(ev, col("u"), col("et"),
        col("tu"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L), s"got ${got.keySet}")
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3L)), s"u1: ${got(1L)}")
    assert(got(2L) == ((Some(10L), Some(20L), None, 2L)), s"u2: ${got(2L)}")
    assert(got(3L) == ((Some(10L), None, None, 1L)), s"u3: ${got(3L)}")
    assert(got(5L) == ((Some(10L), Some(20L), None, 2L)), s"u5: ${got(5L)}")
  }
}
