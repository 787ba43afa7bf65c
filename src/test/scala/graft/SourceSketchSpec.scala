package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profile}

/** C134 union-MinHash source sketches: the union-merge law (the whole
  * incremental story), estimator sanity against exact Jaccard, and the
  * new-source passthrough of the merge.
  */
class SourceSketchSpec extends AnyFunSuite {
  import SparkTest._

  private def docs(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("source", "text")
  }

  test("sketch of a union equals the elementwise-min merge of sketches") {
    val a = docs(Seq(
      "s1" -> "alpha beta gamma delta epsilon zeta",
      "s2" -> "one two three four five six seven"))
    val b = docs(Seq(
      "s1" -> "gamma delta eta theta iota kappa",
      "s3" -> "red green blue cyan magenta"))
    val full = Profile.sourceMinhashSketches(
      a.unionByName(b), col("source"), col("text"), n = 2, k = 32)
    val merged = Profile.mergeSourceSketches(
      Profile.sourceMinhashSketches(a, col("source"), col("text"), n = 2, k = 32),
      Profile.sourceMinhashSketches(b, col("source"), col("text"), n = 2, k = 32))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val (mf, mm) = (m(full), m(merged))
    assert(mf.keySet == Set("s1", "s2", "s3"))
    assert(mm == mf, "merge must equal the from-scratch union sketch, slot for slot")
  }

  test("identical sources estimate J = 1; disjoint sources estimate near 0") {
    val d = docs(Seq(
      "a" -> "the quick brown fox jumps over the lazy dog",
      "b" -> "the quick brown fox jumps over the lazy dog",
      "c" -> "uno dos tres cuatro cinco seis siete ocho nueve"))
    val sk = Profile.sourceMinhashSketches(d, col("source"), col("text"), n = 2, k = 64)
    val sim = Profile.sourceSketchSimilarity(sk, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sim(("a", "b")) == 64L, "equal shingle sets must match every slot")
    assert(sim(("a", "c")) == 0L, "disjoint shingle sets share no slot minimum")
    assert(sim(("b", "c")) == 0L)
  }

  test("estimates track exact Jaccard within the k-slot error bound on sf data") {
    val d = graft.sources.Tables(spark, sf).documents
    val sk = Profile.sourceMinhashSketches(d, col("source"), col("text"), n = 2, k = 64)
    val est = Profile.sourceSketchSimilarity(sk, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val exact = d
      .select(col("source"), explode(Dedup.wordShingles(col("text"), 2)).as("g"))
      .distinct()
    val tot = exact.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shared = exact.toDF("sa", "g")
      .join(exact.toDF("sb", "g"), "g")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("sh"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // 4σ at k=64 and J ≈ 0.5 is ~0.25; a correlated-slot regression
    // (the single-multiply mixer this spec was written against) blows
    // through it with |err| up to 0.38
    var checked = 0
    for (((pa, pb), sh) <- shared) {
      val truth = sh.toDouble / (tot(pa) + tot(pb) - sh)
      val e = est.getOrElse((pa, pb), 0.0)
      assert(math.abs(e - truth) <= 0.25,
        s"($pa, $pb): est $e vs exact $truth drifts past the slot bound")
      checked += 1
    }
    assert(checked >= 3, s"fixture too sparse: only $checked source pairs")
  }

  test("merge passes through sources present on only one side") {
    val a = docs(Seq("only_a" -> "x y z w v u"))
    val b = docs(Seq("only_b" -> "p q r s t o"))
    val sa = Profile.sourceMinhashSketches(a, col("source"), col("text"), n = 2, k = 16)
    val sb = Profile.sourceMinhashSketches(b, col("source"), col("text"), n = 2, k = 16)
    val merged = Profile.mergeSourceSketches(sa, sb)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val ua = sa.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val ub = sb.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == ua ++ ub)
  }
}
