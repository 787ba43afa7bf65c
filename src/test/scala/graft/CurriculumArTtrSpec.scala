package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Profile}
import graft.multimodal.Media

/** Hand fixtures for the round-12 additions: curriculum staging
  * (C144), aspect-ratio bucketing (C143), lexical diversity (C142).
  */
class CurriculumArTtrSpec extends AnyFunSuite {
  import SparkTest._

  test("curriculumStages: levels order the stages, token mass splits evenly") {
    import spark.implicits._
    // 8 docs, 2 levels, 10 tokens each -> total 80, 4 stages of 20
    val df = (1L to 8L).map(i => (i, 10L, if (i <= 4) 0L else 1L))
      .toDF("id", "toks", "lvl")
    val got = Curation.curriculumStages(df, col("id"), col("toks"), col("lvl"),
        nStages = 4)
      .orderBy(col("pos")).collect()
    assert(got.map(_.getAs[Long]("pos")).toSeq == (1L to 8L).toSeq)
    // stages are non-decreasing along the curriculum order and every
    // level-0 doc precedes every level-1 doc
    val lvls = got.map(_.getAs[Long]("level")).toSeq
    assert(lvls == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L))
    val stages = got.map(_.getAs[Long]("stage")).toSeq
    assert(stages == Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L),
      s"80 tokens / 4 stages = 2 docs each: $stages")
  }

  test("curriculumStages: zero-token tail clamps to the last stage") {
    import spark.implicits._
    val df = Seq((1L, 5L, 0L), (2L, 5L, 0L), (3L, 0L, 1L))
      .toDF("id", "toks", "lvl")
    val got = Curation.curriculumStages(df, col("id"), col("toks"), col("lvl"),
        nStages = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stage")).toMap
    // doc 3 starts AT the total (cum_before = 10 = total) -> raw stage
    // 2 clamps to nStages-1
    assert(got(3L) == 1L, "zero-token doc at the end must clamp, not overflow")
    assert(Seq(got(1L), got(2L)).sorted == Seq(0L, 1L))
  }

  test("arBuckets: integer nearest-ratio argmin with earlier-entry ties") {
    import spark.implicits._
    val meta = Seq(
      (1L, 100L, 100L),  // exactly 1:1
      (2L, 160L, 90L),   // exactly 16:9
      (3L, 90L, 160L),   // exactly 9:16
      (4L, 40L, 30L),    // exactly 4:3
      (5L, 17L, 12L))    // EXACT tie between 4:3 and 3:2 -> 4:3 (earlier)
      .toDF("media_id", "width", "height")
    val got = Media.arBuckets(meta, batchSize = 8)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[String]("bucket")).toMap
    assert(got == Map(1L -> "1:1", 2L -> "16:9", 3L -> "9:16",
      4L -> "4:3", 5L -> "4:3"),
      s"tie |17*3-4*12|*48 = |17*2-3*12|*72 = 144 breaks to the earlier entry: $got")
  }

  test("arBuckets: batches fill within a bucket; NULL dims drop") {
    import spark.implicits._
    val meta = (1L to 10L).map(i => (i, 50L, 50L))
      .toDF("media_id", "width", "height")
      .unionByName(Seq((99L, Option.empty[Long], Option(5L)))
        .toDF("media_id", "width", "height"))
    val got = Media.arBuckets(meta, batchSize = 4).collect()
    assert(got.length == 10, "the NULL-width row must drop")
    assert(got.forall(_.getAs[String]("bucket") == "1:1"))
    val batchSizes = got.groupBy(_.getAs[Long]("batch_idx"))
      .view.mapValues(_.length).toMap
    assert(batchSizes == Map(0L -> 4, 1L -> 4, 2L -> 2),
      s"10 docs at batchSize 4 pack 4/4/2: $batchSizes")
    // pos is a permutation of 1..10 (the deterministic shuffle order)
    assert(got.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to 10L).toSeq)
  }

  test("lexicalDiversity: hand-counted TTR and hapax ratio per source") {
    import spark.implicits._
    val docs = Seq(
      ("A", "a b a"),          // tokens 3, types 2 {a:2, b:1}, hapax 1
      ("B", "x y"),            // tokens 2, types 2, hapax 2
      ("B", "x  "))            // empty tokens drop: tokens 1, x again
      .toDF("source", "text")
    val got = Profile.lexicalDiversity(docs, col("source"), col("text"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Double]("ttr"),
          r.getAs[Double]("hapax_ratio"))).toMap
    assert(got("A") == ((3L, 2L, 1L, 0.666667, 0.5)))
    assert(got("B") == ((3L, 2L, 1L, 0.666667, 0.5)),
      "x appears in both B docs (count 2), y once: hapax 1 of 2 types")
  }
}
