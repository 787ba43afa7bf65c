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
}
