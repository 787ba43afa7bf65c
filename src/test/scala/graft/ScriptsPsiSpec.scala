package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Profile

/** Hand fixtures for the codepoint-class mix (C151) and the PSI
  * drift scalar (C152).
  */
class ScriptsPsiSpec extends AnyFunSuite {
  import SparkTest._

  test("charClassMix: hand-counted classes; empty text has NULL fractions") {
    import spark.implicits._
    val got = Seq((1L, "ab1 C!"), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.charClassMix(col("text")).as("m"))
      .select(col("doc_id"), col("m.*"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d1 = got(1L)
    // "ab1 C!": letters a,b,C = 3; digit 1; space 1; other ! = 1
    assert(d1.getAs[Long]("n_chars") == 6L)
    assert(d1.getAs[Long]("n_letters") == 3L)
    assert(d1.getAs[Long]("n_digits") == 1L)
    assert(d1.getAs[Long]("n_spaces") == 1L)
    assert(d1.getAs[Long]("n_other") == 1L)
    assert(d1.getAs[Double]("letter_frac") == 0.5)
    val d2 = got(2L)
    assert(d2.getAs[Long]("n_chars") == 0L)
    assert(d2.isNullAt(d2.fieldIndex("letter_frac")),
      "zero-length doc has no honest denominator")
  }

  test("psiByGroup: identical snapshots score ~0, a shifted one scores big") {
    import spark.implicits._
    // old: 40 docs in bucket 3 (lengths 8-15), 40 in bucket 5 (32-63)
    val old = ((1L to 40L).map(i => ("s", 10L)) ++
      (1L to 40L).map(i => ("s", 40L))).toDF("src", "len")
    val same = old
    val gotSame = Profile.psiByGroup(old, same, col("src"), col("len"))
      .collect().head
    assert(math.abs(gotSame.getAs[Double]("psi")) < 1e-6,
      "identical distributions: PSI must be ~0 (exactly 0 up to smoothing)")
    // new: everything migrated to bucket 5
    val moved = (1L to 80L).map(i => ("s", 40L)).toDF("src", "len")
    val gotMoved = Profile.psiByGroup(old, moved, col("src"), col("len"))
      .collect().head
    assert(gotMoved.getAs[Double]("psi") > 0.25,
      s"a wholesale bucket migration must cross the 0.25 action line: " +
        gotMoved.getAs[Double]("psi"))
    assert(gotMoved.getAs[Long]("n_buckets") == 2L)
  }

  test("psiByGroup: PSI is per-group and order-of-groups independent") {
    import spark.implicits._
    val old = Seq(("a", 10L), ("a", 10L), ("b", 40L), ("b", 40L))
      .toDF("src", "len")
    val nw = Seq(("a", 10L), ("a", 10L), ("b", 10L), ("b", 10L))
      .toDF("src", "len")
    val got = Profile.psiByGroup(old, nw, col("src"), col("len"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(math.abs(got("a")) < 1e-6, "group a unchanged")
    assert(got("b") > 0.25, s"group b fully migrated: ${got("b")}")
  }
}
