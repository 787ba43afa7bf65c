package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Keywords

/** C141 RAKE: hand-computable degree/frequency scoring, the candidate
  * cap, per-doc isolation, and duplicate-phrase collapse.
  */
class RakeSpec extends AnyFunSuite {
  import SparkTest._

  private def rake(docs: Seq[(Long, String)], k: Int = 5, cap: Int = 8) = {
    import spark.implicits._
    Keywords.rakeTopK(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        stopwords = Seq("the", "of", "and"), k = k, maxPhraseWords = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
  }

  test("textbook scoring: co-occurring words outrank a lone repeater") {
    // candidates: "deep neural nets", "deep learning", "rust" (x2)
    // deg: deep=5, neural=3, nets=3, learning=2, rust=2; freq: deep=2,
    // rust=2, rest 1 → wscore(micro): deep 2.5M, neural 3M, nets 3M,
    // learning 2M, rust 1M
    val got = rake(Seq(
      (1L, "deep neural nets and deep learning of rust the rust")))
    val byPhrase = got.map(g => g._3 -> g._4).toMap
    assert(byPhrase("deep neural nets") == 8500000L)
    assert(byPhrase("deep learning") == 4500000L)
    assert(byPhrase("rust") == 1000000L)
    assert(got.sortBy(_._2).map(_._3).toSeq ==
      Seq("deep neural nets", "deep learning", "rust"))
  }

  test("candidates past the cap drop and stop billing word degrees") {
    val long9 = (1 to 9).map(i => s"w$i").mkString(" ")
    val got = rake(Seq((1L, s"$long9 the w1 w2")), cap = 8)
    // the 9-word run is gone entirely; only "w1 w2" survives, scored
    // over the CAPPED candidate set (deg 2 each, freq 1)
    assert(got.map(_._3).toSeq == Seq("w1 w2"))
    assert(got.head._4 == 4000000L)
  }

  test("word stats never leak across documents") {
    val got = rake(Seq((1L, "alpha beta"), (2L, "alpha")))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(_._3).toSeq == Seq("alpha"))
    assert(d2.head._4 == 1000000L,
      "doc 2's 'alpha' must score over doc 2's candidates only")
  }

  test("a phrase repeating in one doc collapses to one ranked row") {
    val got = rake(Seq((1L, "x y the x y")))
    assert(got.length == 1)
    assert(got.head._3 == "x y")
  }
}
