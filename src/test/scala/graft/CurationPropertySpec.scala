package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Generative checks of the deterministic carving operators'
  * STRUCTURAL claims across random inputs and random cut
  * configurations (the oracles prove them on the one fixed corpus):
  *
  * - splitByHash PARTITIONS: every row gets exactly one label, the
  *   label matches its bucket range, and restricting any split to its
  *   range reproduces the flat sampleByHash under the same salt.
  * - sampleByBudget is a MINIMAL covering prefix for any budget: a
  *   contiguous pos-prefix, every member starts before the cut, and
  *   dropping the last member falls below the budget.
  */
class CurationPropertySpec extends AnyFunSuite {
  import SparkTest._

  private def ids(seed: Long, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // non-contiguous ids: the FNV bucket must not depend on density
    (0 until n).map(i => (i * 7L + rnd.nextInt(5), rnd.nextInt(1000).toLong))
      .distinctBy(_._1)
  }

  test("corpus diff equals plain set algebra on random snapshot pairs") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def snap(): Map[Long, String] =
        (0 until 30).filter(_ => rnd.nextBoolean())
          .map(i => i.toLong -> s"t${rnd.nextInt(3)}").toMap
      val (o, n) = (snap(), snap())
      val want = (o.keySet ++ n.keySet).map { id =>
        id -> ((o.get(id), n.get(id)) match {
          case (None, Some(_))          => "added"
          case (Some(_), None)          => "removed"
          case (a, b) if a == b         => "unchanged"
          case _                        => "changed"
        })
      }.toMap
      val got = Curation.corpusDiff(
          o.toSeq.toDF("doc_id", "text"), n.toSeq.toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }

  test("hashed contamination equals string-gram recompute on random corpora") {
    // the broadcast carries xxhash64(gram), not the gram string; the
    // count must still equal the straightforward string-set overlap
    // (collisions are ~1e-11-probable — a mismatch here is a logic bug)
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val n = 3
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def text() = Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val corpus = (0 until 20).map(i => (i.toLong, text()))
      val eval = (0 until 5).map(_ => text())
      def grams(t: String): Set[String] =
        t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val evalGrams = eval.flatMap(grams).toSet
      val want = corpus.map { case (id, t) => id -> grams(t).count(evalGrams.contains).toLong }
        .filter(_._2 > 0).toMap
      val got = graft.operators.Curation.contamination(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"),
          eval.toDF("t"), col("t"), n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed: got $got want $want")
    }
  }

  test("splitByHash partitions every corpus for every pct configuration") {
    import spark.implicits._
    val configs = Seq(
      Seq("train" -> 90, "val" -> 5, "test" -> 5),
      Seq("a" -> 50, "b" -> 50),
      Seq("x" -> 1, "y" -> 99),
      Seq("only" -> 100))
    for (seed <- 1 to 3; splits <- configs) {
      val df = ids(seed, 200).toDF("doc_id", "payload")
      val got = Curation.splitByHash(df, col("doc_id"), splits, salt = s"s$seed")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      assert(got.length == df.count(), "split dropped or duplicated rows")
      val cuts = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
      got.foreach { case (_, bucket, label) =>
        val expect = splits.zip(cuts).collectFirst {
          case ((name, _), cut) if bucket < cut => name
        }.getOrElse(splits.last._1)
        assert(label == expect, s"bucket $bucket labeled $label under $splits")
      }
      // each split == the flat sample of its bucket range (shared recipe)
      val first = splits.head
      val flat = Curation.sampleByHash(df, col("doc_id"), first._2, salt = s"s$seed")
        .collect().map(_.getLong(0)).toSet
      val split0 = got.filter(_._3 == first._1).map(_._1).toSet
      assert(split0 == flat, s"split '${first._1}' != flat ${first._2}% sample")
    }
  }

  test("sampleByBudget is a minimal covering prefix for random budgets") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 17L)
      val df = ids(seed, 150).toDF("doc_id", "n_tokens")
      val total = df.agg(sum(col("n_tokens"))).head().getLong(0)
      val budget = 1L + rnd.nextLong(total)
      val got = Curation.sampleByBudget(df, col("doc_id"), col("n_tokens"), budget)
        .orderBy(col("pos")).collect()
        .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("n_tokens"), r.getAs[Long]("cum")))
      assert(got.nonEmpty)
      assert(got.map(_._1).toSeq == (1L to got.length.toLong), "not a contiguous prefix")
      got.foreach { case (_, n, cum) =>
        assert(cum - n < budget, "a member started at or past the cut") }
      assert(got.last._3 >= budget || got.length == df.count().toInt,
        "prefix neither covers the budget nor exhausts the corpus")
      assert(got.init.lastOption.forall(_._3 < budget), "prefix not minimal")
    }
  }
}
