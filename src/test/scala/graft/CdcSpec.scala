package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profile}

/** C121 content-defined chunking and C120 rater-agreement contracts —
  * the structural invariants the corpus oracles can't isolate:
  * exact tiling, the anchored max-length bound, boundary stability
  * under an offset shift (the property CDC exists for), and kappa on
  * hand-computable confusion matrices.
  */
class CdcSpec extends AnyFunSuite {
  import SparkTest._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def chunksOf(df: org.apache.spark.sql.DataFrame) =
    Dedup.cdcChunks(df, col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  // deterministic pseudo-random ASCII text: enough entropy that
  // content cuts actually fire (~every div chars)
  private def lcgText(n: Int, seed: Long): String = {
    val sb = new StringBuilder(n)
    var x = seed
    (0 until n).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + ((x >>> 33) % 26)).toChar)
    }
    sb.toString
  }

  test("chunks tile the text exactly and respect the anchored max bound") {
    val t = lcgText(2000, seed = 7)
    val ch = chunksOf(docs(1L -> t))
    assert(ch.nonEmpty)
    // contiguous 1-based tiling: starts chain, lengths sum to the text
    assert(ch.head._2 == 1L)
    ch.sliding(2).foreach {
      case Array((_, s1, l1, _), (_, s2, _, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    assert(ch.map(_._3).sum == t.length.toLong)
    // anchored cuts at every multiple of maxLen bound every chunk
    assert(ch.forall(_._3 <= 256L), s"over-long chunk: ${ch.maxBy(_._3)}")
    // content cuts actually fire: far more chunks than the anchored
    // minimum of len/maxLen
    assert(ch.length > 2000 / 256 * 2, s"only ${ch.length} chunks")
  }

  test("boundaries realign after an offset shift (the CDC property)") {
    val t = lcgText(2000, seed = 11)
    val shifted = "XYZXYZX" + t // 7-char insertion at the front
    val a = chunksOf(docs(1L -> t)).map(_._4)
    val b = chunksOf(docs(1L -> shifted)).map(_._4)
    // every cut depends on a 8-char window (content) or an absolute
    // anchor (rare: ~1/8 of cuts here), so most chunk CONTENT survives
    // the shift even though every absolute offset moved
    val shared = a.toSet.intersect(b.toSet).size
    assert(shared * 2 > a.length,
      s"only $shared of ${a.length} chunk hashes survived a 7-char prefix insertion")
    // fixed-size blocking, by contrast, loses every block after the
    // insertion point — the comparison that motivates CDC
    val fixedA = t.grouped(64).toSeq
    val fixedB = shifted.grouped(64).toSeq
    assert(fixedA.toSet.intersect(fixedB.toSet).isEmpty)
  }

  test("edges: empty text chunks to nothing, NULL text drops, short text is one chunk") {
    import spark.implicits._
    val df = Seq((1L, ""), (3L, "tiny")).toDF("doc_id", "text")
      .union(Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val ch = chunksOf(df)
    assert(ch.toSeq.map(c => (c._1, c._2, c._3)) == Seq((3L, 1L, 4L)))
  }

  test("cdcChunkDedup reports a shared span across docs with different prefixes") {
    val shared = lcgText(600, seed = 23)
    val d = docs(
      1L -> (lcgText(100, seed = 1) + shared),
      2L -> (lcgText(150, seed = 2) + shared))
    val dup = Dedup.cdcChunkDedup(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dup.exists(_._3 == 2L),
      s"no chunk shared by both docs in ${dup.toSeq}")
    // a reported duplicate's length is a real chunk length
    assert(dup.forall(x => x._2 >= 1 && x._2 <= 256))
  }

  test("cdcDedupRewrite keeps exactly one copy of a duplicated span, min-keyed") {
    val shared = lcgText(600, seed = 31)
    val pre1 = lcgText(64, seed = 41)
    val pre2 = lcgText(96, seed = 42)
    val d = docs(1L -> (pre1 + shared), 2L -> (pre2 + shared))
    val got = Dedup.cdcDedupRewrite(d, col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val Array(r1, r2) = got
    // doc 1 is the (doc_id, start)-minimal keeper everywhere → loses
    // nothing and reassembles byte-exactly; doc 2 drops the shared
    // interior chunks but keeps its unique prefix
    assert(r1._3 == 0L && r1._4 == pre1 + shared, s"doc1: $r1")
    assert(r2._3 >= 1L && r2._4.length < (pre2 + shared).length)
    assert(r2._4.startsWith(pre2.take(8)))
    // conservation: doc 2's kept chunks are a subsequence of its text
    assert((pre2 + shared).indexOf(r2._4.take(50)) >= 0 || r2._4.isEmpty)
    // no duplicates: with both docs identical, the second empties
    val twin = docs(1L -> shared, 2L -> shared)
    val t = Dedup.cdcDedupRewrite(twin, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    assert(t(0).getString(3) == shared && t(1).getString(3) == "")
    assert(t(1).getLong(2) == t(1).getLong(1)) // every chunk dropped
  }

  test("cdcPairs pairs the shared-span docs; the ubiquity cap evicts template chunks") {
    val shared = lcgText(600, seed = 23)
    val d = docs(
      1L -> (lcgText(100, seed = 1) + shared),
      2L -> (lcgText(150, seed = 2) + shared),
      3L -> lcgText(300, seed = 3))
    val pairs = Dedup.cdcPairs(d, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2), s"got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // every chunk of 5 identical docs is in 5 > cap docs → all evicted,
    // no pairs: a template cluster must not explode the join
    val many = docs((1L to 5L).map(i => i -> ("X" + shared)): _*)
    assert(Dedup.cdcPairs(many, col("doc_id"), col("text"),
      maxDocsPerChunk = 4).count() == 0)
  }

  test("stratifiedSplit: floor-exact per-stratum counts, stratum independence, NULL drop") {
    import graft.operators.Curation
    import spark.implicits._
    val a = (1L to 20L).map(i => (i, "a"))
    val b = (100L to 103L).map(i => (i, "b"))
    val df = (a ++ b).toDF("doc_id", "source")
      .union(Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "source"))
    val got = Curation.stratifiedSplit(df, col("doc_id"), col("source"),
        valNum = 1, valDen = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(4)))
    // floor-exact: 20/4 = 5 val in a, 4/4 = 1 val in b; NULL stratum gone
    assert(got.length == 24)
    assert(got.count(x => x._2 == "a" && x._3 == "val") == 5)
    assert(got.count(x => x._2 == "b" && x._3 == "val") == 1)
    // stratum independence: growing b never flips a's assignments
    val aOnly = Curation.stratifiedSplit(a.toDF("doc_id", "source"),
        col("doc_id"), col("source"), valNum = 1, valDen = 4)
      .collect().map(r => (r.getLong(0), r.getString(4))).toSet
    assert(got.filter(_._2 == "a").map(x => (x._1, x._3)).toSet == aOnly)
    // a 0-fraction split sends everything to train
    val none = Curation.stratifiedSplit(df, col("doc_id"), col("source"),
      valNum = 0, valDen = 10)
    assert(none.filter(col("split") === "val").count() == 0)
  }

  test("reliability: pmod-floor bands for negative scores, exact rates") {
    import spark.implicits._
    val df = Seq((-201L, false), (-200L, false), (-1L, false), (0L, true),
      (199L, true), (200L, true), (399L, false))
      .toDF("score", "f")
    val got = Profile.reliability(df, col("score"), col("f"), width = 200L)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // floor semantics: -201 → band -2, -200 and -1 → band -1 (an
    // engine-truncating division would put -201 in band -1)
    assert(got.toSeq == Seq(
      (-2L, -400L, -201L, 1L, 0L, 0.0),
      (-1L, -200L, -1L, 2L, 0L, 0.0),
      (0L, 0L, 199L, 2L, 2L, 1.0),
      (1L, 200L, 399L, 2L, 1L, 0.5)), s"got ${got.toSeq}")
  }

  test("kappa on a hand confusion matrix; chance-only and degenerate cases") {
    import spark.implicits._
    def frame(tt: Int, tf: Int, ft: Int, ff: Int) =
      (Seq.fill(tt)((true, true)) ++ Seq.fill(tf)((true, false)) ++
        Seq.fill(ft)((false, true)) ++ Seq.fill(ff)((false, false)))
        .toDF("ra", "rb")
    // po = 0.7, pe = (50·60 + 50·40)/100² = 0.5 → kappa = 0.4
    val r = Profile.raterAgreement(frame(40, 10, 20, 30), col("ra"), col("rb"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((100L, 40L, 10L, 20L, 30L)))
    assert(r.getDouble(5) == 0.7 && r.getDouble(6) == 0.5 && r.getDouble(7) == 0.4)
    // both raters constant-true: agreement is perfect but pe = 1 →
    // kappa undefined (NULL), never NaN
    val deg = Profile.raterAgreement(frame(5, 0, 0, 0), col("ra"), col("rb"))
      .collect().head
    assert(deg.getDouble(5) == 1.0 && deg.isNullAt(7))
    // independent raters with these marginals: po == pe → kappa 0
    val chance = Profile.raterAgreement(frame(25, 25, 25, 25), col("ra"), col("rb"))
      .collect().head
    assert(chance.getDouble(7) == 0.0)
    // NULL verdicts count as rejections
    val withNull = Seq((Some(true), Some(true)), (None, Some(true)), (Some(false), None))
      .toDF("ra", "rb")
    val n = Profile.raterAgreement(withNull, col("ra"), col("rb")).collect().head
    assert((n.getLong(1), n.getLong(2), n.getLong(3), n.getLong(4)) == ((1L, 0L, 1L, 1L)))
  }
}
