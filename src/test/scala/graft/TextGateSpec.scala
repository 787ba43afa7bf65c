package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Gopher-rule gate (C25) + vocabulary head (C26) edges the registered
  * oracle queries can't isolate: exact threshold boundaries (the rules
  * are integer comparisons, so the boundary row must be deterministic),
  * per-rule independence, and the vocab top-k cut. */
class TextGateSpec extends AnyFunSuite {
  import SparkTest._

  private def gate(text: String): Map[String, Any] = {
    import spark.implicits._
    val rules = TextFunctions.gopherRules(col("t"),
      minTokens = 5, maxTokens = 10, minMeanLen = 3, maxMeanLen = 6)
    val row = Seq(text).toDF("t")
      .select(rules.map { case (n, c) => c.as(n) }: _*).head()
    rules.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  test("word-count boundary: exactly minTokens passes, one below fails") {
    assert(gate("the and one two five").apply("ok_word_count") == true)   // 5 tokens
    assert(gate("the and one four").apply("ok_word_count") == false)      // 4 tokens
  }

  test("mean-length boundary: chars == minMeanLen*tokens passes exactly") {
    // 5 tokens × 3 chars = 15 chars → mean exactly 3.0 → pass
    assert(gate("the abc def ghi jkl").apply("ok_mean_len") == true)
    // 5 tokens, 14 chars → mean 2.8 → fail, with no float in sight
    assert(gate("th abc def ghi jkl").apply("ok_mean_len") == false)
  }

  test("alpha boundary: 4 of 5 alpha tokens passes, 3 of 5 fails") {
    assert(gate("the and foo 12 bar").apply("ok_alpha") == true)
    assert(gate("the and 34 12 bar").apply("ok_alpha") == false)
  }

  test("stopword rule counts DISTINCT stopwords, not occurrences") {
    val g = gate("the the the the the")
    assert(g("n_stop_distinct") == 1L)
    assert(g("ok_stopwords") == false)
    assert(gate("the and xxx yyy zzz").apply("ok_stopwords") == true)
  }

  test("gopherGate fails fast when the input already carries a measure column") {
    // a profiling step upstream can plausibly leave an n_tokens column;
    // appending the gate's measures would then make col("n_tokens")
    // ambiguous (or silently read the stale one) — refuse instead
    import spark.implicits._
    val df = Seq((1L, "some text here", 3L)).toDF("doc_id", "text", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      TextFunctions.gopherGate(df, col("text"),
        minTokens = 1, maxTokens = 100, minMeanLen = 1, maxMeanLen = 100)
    }
    assert(e.getMessage.contains("n_tokens"), s"unexpected: ${e.getMessage}")
  }

  test("passes is the conjunction of all four rules") {
    val good = gate("the and foo bar bazz")
    assert(good("passes") == true, s"expected all-pass: $good")
    // 3+3+9+9+9 = 33 chars > 6·5 tokens → mean-length rule alone fails it
    val bad = gate("the and aaaaaaaaa bbbbbbbbb ccccccccc")
    assert(bad("ok_mean_len") == false && bad("passes") == false)
  }

  test("vocab: ranks by tf desc with term tie-break, frac sums to ≤1") {
    val rows = graft.functions.TextQueries.qVocab.fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50) // sf0.001's vocab is < 50 terms
    val tfs = rows.map(_.getAs[Long]("tf"))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b }, "tf not descending")
    val fracs = rows.map(_.getAs[Double]("corpus_frac"))
    // each frac is rounded to 6 dp → may round UP by 5e-7 apiece
    assert(fracs.sum <= 1.0 + rows.length * 5e-7)
    assert(rows.map(_.getAs[Long]("vocab_rank")).toSeq == (1L to rows.length.toLong))
  }

  test("vocab plans a bounded top-k, not a full single-partition sort") {
    val plan = graft.functions.TextQueries.qVocab.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-50 should plan TakeOrderedAndProject:\n$plan")
  }

  test("boilerplate: planted shared span ranks first; singleton grams excluded") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter for more updates"     // 7 tokens
    val docs = Seq(
      1L -> s"alpha beta gamma delta epsilon $boiler",
      2L -> s"$boiler zeta eta theta iota kappa",
      3L -> s"lambda mu $boiler nu xi omicron",
      4L -> "totally unrelated words that repeat nothing from the others at all")
      .toDF("doc_id", "text")
    // same aggregation the registered query runs, without the table dep
    val grams = docs.select(col("doc_id"),
      explode(graft.operators.Dedup.wordShingles(col("text"), n = 5, distinct = false))
        .as("gram"))
    val agg = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_count"), sum(col("cnt")).as("n_occurrences"))
      .filter(col("doc_count") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the 7-token boiler phrase yields 3 distinct 5-grams, each in all 3 docs
    assert(agg.size == 3 && agg.values.forall(_ == 3L), s"got $agg")
    assert(agg.keys.forall(boiler.contains(_)))
  }

  test("boilerplate removal: the registered query actually deletes flagged spans") {
    val rows = graft.functions.TextQueries.qBoilerplateRm.fn(spark, sf).collect()
    val t = graft.sources.Tables(spark, sf)
    assert(rows.length == t.documents.count())
    val removed = rows.map(_.getAs[Long]("removed_chars"))
    // sf0.001 has >1000 repeated 5-grams, so surgery must happen...
    assert(removed.exists(_ > 0), "no document had any boilerplate removed")
    // ...and only ever REMOVES (replace-with-space can't grow the text)
    assert(removed.forall(_ >= 0))
    // a cleaned doc no longer contains the top-ranked gram
    val top = graft.functions.TextQueries.qBoilerplate.fn(spark, sf)
      .orderBy(col("boiler_rank")).limit(1).collect().head.getAs[String]("gram")
    assert(rows.forall(r => !r.getAs[String]("clean").contains(top)),
      s"top boilerplate gram '$top' survives in some cleaned doc")
  }

  test("registered boilerplate query plans the bounded top-k") {
    val plan = graft.functions.TextQueries.qBoilerplate.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-100 should plan TakeOrderedAndProject:\n$plan")
  }

  test("encodingArtifacts: each class counted at its width; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "caf\u00C3\u00A9 na\u00C3\u00AFve"),          // two mojibake pairs
      (2L, "don\u00E2\u20AC\u2122t \u00E2\u20AC\u0153q"), // two mojibake triples
      (3L, "bad \uFFFD\uFFFD decode"),                     // two replacement chars
      (4L, "ctl\u0007\u0085x\ttab"),                       // C0 + C1; \t is fine
      (5L, "plain prose, caf\u00E9 fine"),                 // real \u00E9 is NOT mojibake
      (6L, "\u00C3 alone")                                 // lead with no second byte
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions.encodingArtifacts(df, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 2L, false),
      (2L, 0L, 0L, 2L, false),
      (3L, 2L, 0L, 0L, false),
      (4L, 0L, 2L, 0L, false),
      (5L, 0L, 0L, 0L, true),
      (6L, 0L, 0L, 0L, true)), s"got ${got.toSeq}")
  }

  test("charEntropy: hand-computed distributions; degenerate runs score 0; empty is NULL") {
    import spark.implicits._
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, "aab"), (5L, ""))
      .toDF("doc_id", "text")
    val got = graft.functions.TextFunctions.charEntropy(df, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // terms are round(-(c/n)·ln(c/n)·1e6) summed exactly
    assert(got.toSeq == Seq(
      (1L, 4L, 1L, 0L, Some(0.0)),
      (2L, 4L, 2L, 693148L, Some(0.693148)),
      (3L, 4L, 4L, 1386296L, Some(1.386296)),
      (4L, 3L, 2L, 636514L, Some(0.636514)),
      (5L, 0L, 0L, 0L, None)),
      s"got ${got.toSeq}")
  }
}
