package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Generative checks of the dedup candidate generators' STRUCTURAL
  * claims on random corpora (the oracle proves them on the one fixed
  * corpus; these prove them across corpus shapes):
  *
  * - ngramJaccardPairs' PPJoin prefix+length filtering is LOSSLESS:
  *   its output must EQUAL the brute-force shingle-Jaccard truth.
  * - simhashPairs' pigeonhole banding is COMPLETE ≤ maxDist: every
  *   brute Hamming-≤-maxDist pair must appear.
  *
  * Corpora are seeded: small vocabulary (forces shingle collisions),
  * planted near-dups (single-token mutations), plus unrelated docs.
  */
class DedupPropertySpec extends AnyFunSuite {
  import SparkTest._

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val bases = (0 until n).map { i =>
      i.toLong -> Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant near-dups: mutate one token of every third doc
    val dups = bases.zipWithIndex.collect { case ((id, text), k) if k % 3 == 0 =>
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.size))
      (id + 1000L) -> toks.mkString(" ")
    }
    bases ++ dups
  }

  private def shingles(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).map(_.mkString(" ")).toSet

  test("passage removal equals brute-force recompute on random corpora") {
    import spark.implicits._
    val n = 4
    (1 to 3).foreach { seed =>
      val docs = corpus(seed, 25)
      val gramsPos: Map[Long, Seq[(String, Int)]] = docs.map { case (id, t) =>
        val toks = t.split(" ")
        id -> (if (toks.length >= n)
          toks.sliding(n).zipWithIndex.map { case (w, i) => (w.mkString(" "), i) }.toSeq
        else Seq.empty)
      }.toMap
      val want = docs.map { case (id, t) =>
        val toks = t.split(" ")
        val others: Set[String] =
          gramsPos.collect { case (k, g) if k != id => g.map(_._1) }.flatten.toSet
        val covered = gramsPos(id).filter(p => others.contains(p._1))
          .flatMap(p => p._2 until (p._2 + n)).toSet
        val kept = toks.zipWithIndex.collect { case (tok, i) if !covered.contains(i) => tok }
        val clean = if (covered.isEmpty) t else kept.mkString(" ")
        (id, clean, (toks.length - kept.length).toLong)
      }.sortBy(_._1)
      val got = Dedup.passageDupRemove(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == want, s"seed $seed")
    }
  }

  test("passage coverage equals brute-force recompute on random corpora") {
    import spark.implicits._
    val n = 4
    (1 to 3).foreach { seed =>
      val docs = corpus(seed, 25)
      val grams: Map[Long, Seq[String]] = docs.map { case (id, t) =>
        val toks = t.split(" ")
        id -> (if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
               else Seq.empty)
      }.toMap
      val want = docs.map { case (id, _) =>
        val mine = grams(id)
        val others = grams.collect { case (k, g) if k != id => g }.flatten.toSet
        val dup = mine.count(others.contains).toLong
        val frac = if (mine.isEmpty) 0.0
          else BigDecimal(dup.toDouble / mine.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, mine.size.toLong, dup, frac)
      }.sortBy(_._1)
      val got = Dedup.passageDupStats(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == want, s"seed $seed: got ${got.take(3)} want ${want.take(3)}")
    }
  }

  test("ngram PPJoin output equals brute-force truth on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val docs = corpus(seed, 30)
      val brute = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingles(ta, 2); sb = shingles(tb, 2)
        inter = (sa & sb).size
        if inter > 0
        j = inter.toDouble / (sa | sb).size
        if j >= 0.5
      } yield (ia, ib)).toSet
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), n = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"seed $seed: PPJoin not lossless " +
        s"(missing ${brute -- got}, extra ${got -- brute})")
    }
  }

  test("simhash banding finds every brute hamming pair on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val docs = corpus(seed + 100, 30)
      val df = docs.toDF("doc_id", "text")
      val sigs = df.select(col("doc_id"),
          graft.operators.Dedup.simhash64(col("text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = (for {
        (ia, _) <- docs; (ib, _) <- docs if ia < ib
        d = java.lang.Long.bitCount(sigs(ia) ^ sigs(ib))
        if d <= 3
      } yield (ia, ib)).toSet
      val got = Dedup.simhashPairs(df, col("doc_id"), col("text"), maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"seed $seed: banding incomplete " +
        s"(missing ${brute -- got}, extra ${got -- brute})")
    }
  }
}
