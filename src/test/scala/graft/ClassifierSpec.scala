package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TextQueries}

/** Hashed linear classifier (C49) invariants the registered oracle
  * can't isolate: the score is a LINEAR fold over token-bucket weights
  * (so per-token scores compose additively), the literal-map and
  * broadcast-join paths agree row-for-row, and the bucket-range guard
  * fires. The oracle query then pins the absolute values against
  * DuckDB's independent FNV chain.
  */
class ClassifierSpec extends AnyFunSuite {
  import SparkTest._

  private val W = TextQueries.demoWeights

  private def score(texts: String*): Seq[Long] = {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    texts.toDF("t")
      .select(TextFunctions.hashedLinearScore(col("t"), W, 512L, bias = 7L))
      .collect().map(_.getLong(0)).toSeq
  }

  test("score is linear: repeats multiply, concatenation adds") {
    val Seq(one, three) = score("wombat", "wombat wombat wombat")
    assert(three - 7L == 3L * (one - 7L))
    val Seq(a, b, ab) = score("alpha", "beta", "alpha beta")
    assert(ab - 7L == (a - 7L) + (b - 7L))
  }

  test("empty and whitespace-only text scores exactly the bias") {
    assert(score("", " ", "   ") == Seq(7L, 7L, 7L))
  }

  test("literal-map and broadcast-join paths agree row-for-row") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, ""),                       // zero tokens: must survive the join path
      (4L, "unseen tokens still hash into some bucket"))
      .toDF("doc_id", "text")
    val lit_ = docs.select(col("doc_id"),
        TextFunctions.hashedLinearScore(col("text"), W, 512L, bias = 3L).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val weights = W.toSeq.toDF("bucket", "w")
    val joined = TextFunctions.hashedLinearScoreJoined(
        docs, col("doc_id"), col("text"), weights, 512L, bias = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lit_ == joined)
  }

  test("out-of-range weight buckets are rejected") {
    intercept[IllegalArgumentException] {
      TextFunctions.hashedLinearScore(col("t"), Map(512L -> 1L), 512L)
    }
    intercept[IllegalArgumentException] {
      TextFunctions.hashedLinearScore(col("t"), Map(-1L -> 1L), 512L)
    }
  }

  test("training separates a separable corpus and composes with the scorer") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    // disjoint vocabularies, equal lengths (so the ln-length feature
    // centers to zero and the SHARE features must do the separating):
    // the trained model must classify the corpus perfectly
    val docs = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, "good solid clean prose here", 1L)
      else (i, "junk junk spam garbage noise", 0L)
    }.toDF("doc_id", "text", "y")
    val model = TextFunctions.trainHashedLogistic(
      docs, col("doc_id"), col("text"), col("y") === 1L,
      nBuckets = 64L, steps = 5, lr = 500.0)
    val rows = model.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.contains(-2L), "length pseudo-bucket must be present")
    assert(rows.keys.forall(b => (b >= 0L && b < 64L) || b == -2L))
    // equal-length classes: the length feature's centered value is 0
    // for every doc, so its weight must have stayed exactly 0
    assert(rows(-2L)._1 == 0L, s"length weight should be 0: ${rows(-2L)}")
    // compose through the PUBLIC scorer: model frame in, labels out
    val scored = TextFunctions.hashedLogisticScoreJoined(
        docs, col("doc_id"), col("text"), model, 64L)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
      .collect().map(r => (r.getAs[Long]("s_fp") >= 0L, r.getAs[Long]("y") == 1L))
    assert(scored.length == 20 && scored.forall { case (p, t) => p == t },
      s"trained classifier must separate the disjoint-vocab corpus: ${scored.toSeq}")
  }

  test("training keeps NULL-text docs in the batch (length row, scoring row)") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    // all-null corpus: every doc survives featurization via its −2
    // length row (x = ln(1+0)-scaled = 0); the model is exactly the
    // single centered length bucket and every doc still gets a score
    val docs = Seq((1L, null: String, 1L), (2L, null: String, 1L),
      (3L, null: String, 0L)).toDF("doc_id", "text", "y")
    val model = TextFunctions.trainHashedLogistic(
      docs, col("doc_id"), col("text"), col("y") === 1L,
      nBuckets = 64L, steps = 3, lr = 1.0)
    val rows = model.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(-2L), s"only the length bucket should exist: $rows")
    val scored = TextFunctions.hashedLogisticScoreJoined(
        docs, col("doc_id"), col("text"), model, 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scored.keySet == Set(1L, 2L, 3L), s"every doc must score: $scored")
    assert(scored.values.forall(_ == 0L),
      s"identical zero features must score the centered 0: $scored")
  }
}
