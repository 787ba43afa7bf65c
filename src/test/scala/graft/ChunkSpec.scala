package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** C68 chunking contracts: the start-emission rule, tiling (every
  * token lands in ≥1 chunk), the overlap arithmetic, and the
  * NULL/short-doc edges the corpus oracle can't see. */
class ChunkSpec extends AnyFunSuite {
  import SparkTest._

  private def doc(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("chunks tile the doc: starts advance by stride, suffix chunks suppressed") {
    val r = TextFunctions.chunkByTokens(
        doc((0 until 10).map(i => s"t$i").mkString(" ")),
        col("doc_id"), col("text"), chunkLen = 4, stride = 3)
      .orderBy(col("chunk_id"))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
    // start 9 is NOT emitted: the chunk at 6 already reached token 10
    assert(r.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9")),
      s"got ${r.toSeq}")
    // tiling: every token index is covered by some [start, start+len)
    val covered = r.flatMap { case (_, s, n, _) => s until (s + n) }.toSet
    assert(covered == (0L until 10L).toSet)
  }

  test("short doc yields one short chunk; longer tail chunk keeps its true length") {
    val short = TextFunctions.chunkByTokens(doc("a b c"),
        col("doc_id"), col("text"), chunkLen = 8, stride = 6)
      .collect().map(x => (x.getLong(1), x.getLong(3), x.getString(4)))
    assert(short.toSeq == Seq((0L, 3L, "a b c")))
    val tail = TextFunctions.chunkByTokens(
        doc((0 until 7).map(i => s"t$i").mkString(" ")),
        col("doc_id"), col("text"), chunkLen = 4, stride = 4)
      .orderBy(col("chunk_id"))
      .collect().map(x => (x.getLong(2), x.getLong(3)))
    assert(tail.toSeq == Seq((0L, 4L), (4L, 3L)))
  }

  test("NULL text chunks to nothing; guards reject bad parameters") {
    assert(TextFunctions.chunkByTokens(doc(null),
      col("doc_id"), col("text"), 4, 3).count() == 0L)
    intercept[IllegalArgumentException] {
      TextFunctions.chunkByTokens(doc("a"), col("doc_id"), col("text"), 4, 5)
    }
    intercept[IllegalArgumentException] {
      TextFunctions.chunkByTokens(doc("a"), col("doc_id"), col("text"), 0, 1)
    }
  }
}
