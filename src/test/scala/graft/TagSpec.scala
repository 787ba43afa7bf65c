package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Keywords

/** C135 dictionary tagging: word-boundary phrase semantics, bag counts
  * vs distinct breadth, untagged absence, dictionary normalization.
  */
class TagSpec extends AnyFunSuite {
  import SparkTest._

  private def tag(docs: Seq[(Long, String)], dict: Seq[(String, String)],
                  maxWords: Int = 2) = {
    import spark.implicits._
    Keywords.tagByDictionary(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), dict.toDF("tag", "term"), maxWords)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("phrases match on word boundaries, never substrings") {
    val got = tag(
      Seq(1L -> "the hash join wins", 2L -> "rehash joining is not it",
          3L -> "hash table and sort merge join"),
      Seq("algo" -> "hash join", "algo" -> "merge join"))
    assert(got.keySet == Set(1L -> "algo", 3L -> "algo"),
      s"substring text must not match a phrase term: $got")
    assert(got(1L -> "algo") == (1L, 1L))
    assert(got(3L -> "algo") == (1L, 1L)) // "merge join" inside the trigram
  }

  test("bag hits vs distinct breadth, case-insensitive both sides") {
    val got = tag(
      Seq(10L -> "Fast fast FAST and slow"),
      Seq("perf" -> "FAST", "perf" -> "slow"))
    assert(got(10L -> "perf") == (4L, 2L),
      "three 'fast' + one 'slow' = 4 hits over 2 distinct terms")
  }

  test("untagged docs are absent; a term may feed multiple tags") {
    val got = tag(
      Seq(1L -> "table scan", 2L -> "nothing relevant here"),
      Seq("layout" -> "table", "exec" -> "scan", "exec" -> "table"))
    assert(!got.keySet.exists(_._1 == 2L))
    assert(got(1L -> "layout") == (1L, 1L))
    assert(got(1L -> "exec") == (2L, 2L), "table bills exec AND layout")
  }

  test("duplicate dictionary rows collapse before matching") {
    val got = tag(
      Seq(1L -> "join join"),
      Seq("j" -> "join", "j" -> "JOIN", "j" -> "join"))
    assert(got(1L -> "j") == (2L, 1L),
      "a term listed thrice must not triple-bill its hits")
  }
}
