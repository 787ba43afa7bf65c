package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Keywords
import graft.operators.Curation

class KeywordsSpec extends AnyFunSuite {
  import SparkTest._

  test("tf-idf ranks rare high-frequency terms first, integer-exact tiebreak") {
    import spark.implicits._
    val df = Seq(
      1L -> "apple apple banana common",
      2L -> "banana cherry common",
      3L -> "common cherry cherry").toDF("doc_id", "text")
    val top = Keywords.tfIdfTopK(df, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // d1: apple (tf 2, df 1) then banana (tf 1, df 2) over common (df 3)
    // d3: cherry (tf 2, df 2) then common (tf 1, df 3)
    assert(top == Set(
      (1L, 1L, "apple"), (1L, 2L, "banana"),
      (2L, 1L, "banana"), (2L, 2L, "cherry"),
      (3L, 1L, "cherry"), (3L, 2L, "common")))
  }

  test("tf-idf score is zero for corpus-wide terms and positive otherwise") {
    import spark.implicits._
    val df = Seq(1L -> "a b", 2L -> "a c").toDF("doc_id", "text")
    val scores = Keywords.tfIdfTopK(df, col("doc_id"), col("text"), k = 3)
      .collect().map(r => r.getString(2) -> r.getDouble(5)).toMap
    assert(scores("a") == 0.0) // df = n_docs
    assert(scores("b") > 0.0 && scores("c") > 0.0)
  }

  test("top-bigram repetition metric: counts, tie-break, and short-doc absence") {
    import spark.implicits._
    import graft.functions.Keywords
    val docs = Seq(
      (1L, "spam spam spam ham"), // "spam spam"×2 beats "spam ham"×1
      (2L, "b a b a"),            // "b a"×2 beats "a b"×1 on count
      (3L, "one"),                // 1 token: no bigrams, absent
      (4L, "a a a")               // overlapping gram: frac must stay ≤ 1
    ).toDF("doc_id", "text")
    val got = Keywords.topNgramStats(docs, col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    // bag count 2 (occurrences overlap), but coverage removes the
    // left-to-right NON-overlapping match only: " spam ham" survives
    assert(got(1L) == (("spam spam", 2L, 9L, 18L, 0.5)))
    // "b a b a": grams = b a, a b, b a → "b a"×2 wins on count; its two
    // occurrences don't overlap, so coverage = 2×3 = 6 of 7 chars
    assert(got(2L) == (("b a", 2L, 6L, 7L, 0.8571)))
    // "a a a": "a a" occurs twice in the bag but covers 3 of 5 chars —
    // the occurrences×length formula would claim 6/5 = 1.2
    assert(got(4L) == (("a a", 2L, 3L, 5L, 0.6)))
    assert(got.values.forall { case (_, _, cov, chars, frac) =>
      cov <= chars && frac <= 1.0 })
  }

  test("unigram log-prob: hand-computed micro-nat sums and means") {
    import spark.implicits._
    // corpus: a:3 b:3 c:1, total 7
    // lp(a)=lp(b)=round(ln(3/7)*1e6)=-847298, lp(c)=round(ln(1/7)*1e6)=-1945910
    val df = Seq((1L, "a a b"), (2L, "a b"), (3L, "b c"), (4L, " "))
      .toDF("doc_id", "text")
    val got = graft.functions.Keywords.unigramLogProb(df, col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (1L, 3L, -2541894L, Some(-0.8473)),   // 2*lp(a)+lp(b)
      (2L, 2L, -1694596L, Some(-0.8473)),
      (3L, 2L, -2793208L, Some(-1.3966)),   // lp(b)+lp(c)
      (4L, 0L, 0L, None)),                  // zero tokens: present, NULL mean
      s"got ${got.toSeq}")
  }

  test("bigram log-prob: hand-computed conditionals; transition-sensitive") {
    import spark.implicits._
    // bigram stream: doc1 → (a b)(b a)(a c), doc2 → (a b)
    // corpus: C(a b)=2, C(b a)=1, C(a c)=1; contexts C(a·)=3, C(b·)=1
    // lp(a b)=round(ln(2/3)·1e6)=-405465, lp(a c)=-1098612, lp(b a)=0
    val df = Seq((1L, "a b a c"), (2L, "a b"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    val got = graft.functions.Keywords.bigramLogProb(df, col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (1L, 3L, -1504077L, Some(-0.5014)),
      (2L, 1L, -405465L, Some(-0.4055)),
      (3L, 0L, 0L, None),                  // 1 token: no transition, NULL mean
      (4L, 0L, 0L, None)),
      s"got ${got.toSeq}")

    // the property unigram scoring cannot have: same token MULTISET,
    // different transitions, different scores
    val perm = Seq((1L, "x y x y x"), (2L, "x x x y y"))
      .toDF("doc_id", "text")
    val scores = graft.functions.Keywords.bigramLogProb(perm, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect().map(_.getLong(2))
    assert(scores(0) != scores(1), s"transition order ignored: ${scores.toSeq}")
  }

  test("oov rate: integer-exact vocab boundary, zero-token NULL") {
    import spark.implicits._
    // corpus terms: a:3 b:2 z:1 → top-2 vocab = {a, b}
    val df = Seq((1L, "a a b"), (2L, "a b z"), (3L, " "))
      .toDF("doc_id", "text")
    val got = Keywords.oovRate(df, col("doc_id"), col("text"), vocabK = 2)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, Some(0.0)),
      (2L, 3L, 1L, Some(0.333333)),
      (3L, 0L, 0L, None)), s"got ${got.toSeq}")

    // vocab tie at the boundary resolves term-asc, never float order:
    // a:2 b:2, vocabK=1 → vocab={a}, so b is OOV
    val tie = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = Keywords.oovRate(tie, col("doc_id"), col("text"), vocabK = 1)
      .head()
    assert((r.getLong(1), r.getLong(2)) == (4L, 2L))
  }

  test("oov rate equals a plain Scala recompute on random corpora") {
    import spark.implicits._
    val vocabPool = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 25).map(i =>
        i.toLong -> Seq.fill(rnd.nextInt(12))(vocabPool(rnd.nextInt(vocabPool.size)))
          .mkString(" "))
      val k = 1 + rnd.nextInt(4)
      val counts = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
        .map(_._1).toSet
      val want = docs.map { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        id -> (toks.length.toLong, toks.count(w => !vocab(w)).toLong)
      }.toMap
      val got = Keywords.oovRate(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), vocabK = k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"seed $seed k=$k: got $got want $want")
    }
  }

  test("pmi equals a plain Scala recompute (micro-nat ranking) on random corpora") {
    import spark.implicits._
    val pool = Vector("x", "y", "z", "w")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 15).map(i =>
        i.toLong -> Seq.fill(2 + rnd.nextInt(10))(pool(rnd.nextInt(pool.size)))
          .mkString(" "))
      val bigrams = docs.flatMap(_._2.split(" ").filter(_.nonEmpty).sliding(2)
        .filter(_.length == 2).map(p => (p(0), p(1))))
      val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = bigrams.size.toLong
      val want = c12.toSeq.filter(_._2 >= 2).map { case ((w1, w2), c) =>
        val micro = math.round(math.log(
          (c.toDouble / c1(w1)) * (total.toDouble / c2(w2))) * 1e6)
        (s"$w1 $w2", c, c1(w1), c2(w2), micro)
      }.sortBy { case (bg, _, _, _, m) => (-m, bg) }
        .take(5)
      val got = Keywords.pmiTopK(docs.toDF("doc_id", "text"), col("text"),
          k = 5, minCount = 2)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), math.round(r.getDouble(5) * 1e6)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq} want $want")
    }
  }

  test("pmi collocations: hand-computed micro-nats, rank ties, minCount") {
    import spark.implicits._
    // bigrams: (a b)×2 (b a)×1 from doc1, (c d)×1 from doc2; total 4
    // marginals: c1 a=2 b=1 c=1; c2 b=2 a=1 d=1
    // PMI(a b)=ln((2/2)(4/2))=ln2→693147; PMI(b a)=PMI(c d)=ln4→1386294
    val df = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = Keywords.pmiTopK(df, col("text"), k = 10, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, "b a", 1L, 1L, 1L, 1.386294), // tie vs "c d" → bigram asc
      (2L, "c d", 1L, 1L, 1L, 1.386294),
      (3L, "a b", 2L, 2L, 2L, 0.693147)), s"got ${got.toSeq}")

    val filtered = Keywords.pmiTopK(df, col("text"), k = 10, minCount = 2)
      .collect().map(_.getString(1))
    assert(filtered.toSeq == Seq("a b"), "minCount must drop hapax pairs")
  }

  test("distributed shard packing equals the single-window prefix sum") {
    val t = graft.sources.Tables(spark, sf)
    val sized = t.documents.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    val got = Curation.packShards(t.documents, col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")), budget = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(_._2)

    // oracle: the naive global window over the same unsigned-hash order
    graft.GraftExtensions.ensureRegistered(spark)
    val h = call_function("fnv1a64", concat(lit("shuffle:"), col("doc_id").cast("string")))
    val ub = shiftrightunsigned(col("h"), 56) // unsigned order = (top byte, signed rest)
    val w = Window.orderBy(ub, col("h"), col("doc_id"))
    val want = sized.withColumn("h", h)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard", expr("(cum - n_tokens) div 1000L"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._2)
    assert(got.toSeq == want.toSeq)

    // packing contract: pos is the permutation 1..n and cum is strictly
    // increasing (no doc lost or double-counted by the offset join)
    assert(got.map(_._2).toSeq == (1L to got.length).toSeq)
    got.zip(got.drop(1)).foreach { case ((_, _, c1, _), (_, _, c2, _)) =>
      assert(c2 > c1)
    }
  }

  test("bpeTrain: hand-computed merges with weighted counts and lexical ties") {
    import SparkTest.spark
    import spark.implicits._
    // words: aaa ×2, aa ×1. Round 1 pairs: (a,a) = 2·2+1 = 5, (a,</w>) = 3.
    // Round 2 (after greedy fold aaa→[aa,a,</w>], aa→[aa,</w>]):
    // (aa,a)=2, (a,</w>)=2, (aa,</w>)=1 — tie broken on l_sym asc: a < aa.
    val df = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val got = graft.functions.Keywords.bpeTrain(df, org.apache.spark.sql.functions.col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 5L),
      (2L, "a", "</w>", "a</w>", 2L)), s"got ${got.toSeq}")
  }

  test("bpeTrain merge application is GREEDY left-to-right, not string-replace") {
    import SparkTest.spark
    import spark.implicits._
    // "aaaaa" → greedy fold under (a,a) gives [aa, aa, a, </w>]; the broken
    // string-replace fold gives [aa, a, aa, </w>]. Round 2's pairs are all
    // count 1, so the lexical tie-break exposes the difference: greedy has
    // (a,</w>) as a pair (wins on l_sym='a'); string-replace has (a,aa)
    // instead (r_sym 'aa' > '</w>' loses the tie it would then face).
    val df = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val got = graft.functions.Keywords.bpeTrain(df, org.apache.spark.sql.functions.col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "</w>", 1L)), s"got ${got.toSeq}")
  }

  test("pplBuckets: integer range-third cuts, boundary inclusivity, unscored docs") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // vocab: a ×7, b ×2, c ×1, d ×1 (total 11). lp_micro = round(ln(tf/11)e6):
    // a = -451985, b = -1704748, c = d = -2397895. Integer means (div,
    // trunc toward zero): doc1 (a a a) = -451985; doc2 (a b) = -1078366;
    // doc3 (c d) = -2397895; doc4 (a a a b) = -765175; doc5 "" unscored.
    // Range [-2397895, -451985] (span 1945910), c1 = mn + span/3 =
    // -1749259, c2 = mn + 2·span/3 = -1100622. doc2 ≥ c2 by 22256 → head.
    val df = Seq((1L, "a a a"), (2L, "a b"), (3L, "c d"), (4L, "a a a b"),
      (5L, "")).toDF("doc_id", "text")
    val got = graft.functions.Keywords.pplBuckets(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))).toMap
    assert(got(1L) == ((Some(-451985L), "head")), s"got ${got(1L)}")
    assert(got(2L) == ((Some(-1078366L), "head")), s"got ${got(2L)}")
    assert(got(4L) == ((Some(-765175L), "head")), s"got ${got(4L)}")
    assert(got(3L) == ((Some(-2397895L), "tail")), s"got ${got(3L)}")
    assert(got(5L) == ((None, "unscored")), s"got ${got(5L)}")
  }

  test("pplBucketsQuantile: exact ECDF tertiles on a skewed corpus where range cuts misbucket") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc j = its own word repeated f_j times → lp_mean(doc j) =
    // round(1e6·ln(f_j / total)): nine DISTINCT scores with one
    // high-frequency outlier (f=100) far above the pack (f=1..8)
    val fs = Seq(1, 2, 3, 4, 5, 6, 7, 8, 100)
    val docs = fs.zipWithIndex.map { case (f, i) =>
      ((i + 1).toLong, Seq.fill(f)(s"w$i").mkString(" "))
    } :+ ((100L, null.asInstanceOf[String]))
    val df = docs.toDF("doc_id", "text")
    val got = Keywords.pplBucketsQuantile(df, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    assert(got.find(_._1 == 100L).get._3 == "unscored")
    val scored = got.filter(_._1 != 100L).map(t => (t._2.get, t._3))
    // pin against the exact ECDF: tertile cuts are the rank-3 and
    // rank-6 ELEMENTS of the 9 sorted scores; labels are strict-above
    val sorted = scored.map(_._1).sorted
    val (c1, c2) = (sorted(2), sorted(5))
    for ((s, b) <- scored) {
      val want = if (s > c2) "head" else if (s > c1) "middle" else "tail"
      assert(b == want, s"score $s: got $b, want $want (cuts $c1/$c2)")
    }
    // 3/3/3 by construction — the property range cuts LOSE here:
    val qCounts = scored.groupBy(_._2).view.mapValues(_.size).toMap
    assert(qCounts == Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"got $qCounts")
    val rCounts = Keywords.pplBuckets(df, col("doc_id"), col("text"))
      .collect().filter(!_.isNullAt(2))
      .groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(rCounts.getOrElse("head", 0) == 1,
      s"range cuts should isolate the outlier as the lone head doc, got $rCounts")
    // empty / all-unscored corpus: no cuts, honestly 'unscored'
    val none = Keywords.pplBucketsQuantile(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .collect().map(_.getString(3)).toSet
    assert(none == Set("unscored"), s"got $none")
  }

  test("bpeApply: hand-computed segmentation, fertility, atomic unk words, NULL text") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // merges trained on "aaa aaa aa" (see the bpeTrain spec): (a,a)→aa then
    // (a,</w>)→a</w>. Applied: "aaa"→[aa,a</w>]; "aaaa"→[aa,aa,</w>]
    // (greedy: no pending 'a' left for the second merge); "aa"→[aa,</w>];
    // "café" fails the printable-ASCII gate → one atomic token.
    val train = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val merges = Keywords.bpeTrain(train, col("text"), 2)
    val docs = Seq((1L, "aaa aaaa"), (2L, "aa café"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Keywords.bpeApply(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getString(4))).toMap
    assert(got(1L) == ((2L, 5L, Some(2.5), "aa a</w> aa aa </w>")), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 3L, Some(1.5), "aa </w> café</w>")), s"got ${got(2L)}")
    assert(got(3L) == ((0L, 0L, None, "")), s"got ${got(3L)}")
  }

  test("bm25 from a parquet-round-tripped index equals the inline search pair-for-pair") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    val docs = Tables(spark, SparkTest.sf).documents
    val queries = Seq(("q1", "hash"), ("q2", "vector"), ("q2", "scan"))
      .toDF("query_id", "term")
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("query_id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
    val inline = rows(Keywords.bm25TopK(docs, col("doc_id"), col("text"),
      queries, k = 5))
    assert(inline.nonEmpty)
    val ix = Keywords.textIndex(docs, col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    def rt(f: org.apache.spark.sql.DataFrame, name: String) = {
      f.write.parquet(s"$base/$name"); spark.read.parquet(s"$base/$name")
    }
    val stored = Keywords.TextIndex(rt(ix.postings, "p"), rt(ix.terms, "t"),
      rt(ix.docs, "d"), rt(ix.stats, "s"))
    assert(rows(Keywords.bm25AgainstIndex(stored, queries, k = 5)) == inline)
    // a frame missing its contract columns fails fast, not silently
    val ex = intercept[IllegalArgumentException] {
      Keywords.bm25AgainstIndex(stored.copy(terms = stored.docs), queries, k = 5)
    }
    assert(ex.getMessage.contains("terms must carry"))
  }

  test("textIndexAppend equals the full rebuild frame-for-frame and search-for-search") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit}
    import graft.sources.Tables
    val docs = Tables(spark, SparkTest.sf).documents
    val full = Keywords.textIndex(docs, col("doc_id"), col("text"))
    val grown = Keywords.textIndexAppend(
      Keywords.textIndex(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        col("doc_id"), col("text")),
      docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"))
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(grown.terms) == sorted(full.terms))
    assert(sorted(grown.docs) == sorted(full.docs))
    assert(sorted(grown.stats) == sorted(full.stats))
    assert(sorted(grown.postings) == sorted(full.postings))
    val queries = Seq(("q1", "hash"), ("q2", "vector")).toDF("query_id", "term")
    def rows(ix: Keywords.TextIndex) =
      Keywords.bm25AgainstIndex(ix, queries, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(rows(grown) == rows(full) && rows(full).nonEmpty)
  }

  test("textIndexRemove equals rebuild-without frame-for-frame and search-for-search") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit, not}
    import graft.sources.Tables
    val docs = Tables(spark, SparkTest.sf).documents
    val dropped = pmod(col("doc_id"), lit(4)) === 3
    val rebuilt = Keywords.textIndex(docs.filter(not(dropped)),
      col("doc_id"), col("text"))
    val pruned = Keywords.textIndexRemove(
      Keywords.textIndex(docs, col("doc_id"), col("text")),
      docs.filter(dropped).select(col("doc_id")))
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(pruned.terms) == sorted(rebuilt.terms))
    assert(sorted(pruned.docs) == sorted(rebuilt.docs))
    assert(sorted(pruned.stats) == sorted(rebuilt.stats))
    assert(sorted(pruned.postings) == sorted(rebuilt.postings))
    val queries = Seq(("q1", "hash"), ("q2", "vector")).toDF("query_id", "term")
    def rows(ix: Keywords.TextIndex) =
      Keywords.bm25AgainstIndex(ix, queries, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(rows(pruned) == rows(rebuilt) && rows(rebuilt).nonEmpty)
    // QL reads ctf — the remove must have maintained it exactly too
    def qlRows(ix: Keywords.TextIndex) =
      Keywords.qlAgainstIndex(ix, queries, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(qlRows(pruned) == qlRows(rebuilt) && qlRows(rebuilt).nonEmpty)
    // replayed and never-indexed ids are no-ops: the delete list is
    // idempotent and removing nothing changes nothing
    val again = Keywords.textIndexRemove(pruned,
      docs.filter(dropped).select(col("doc_id"))
        .unionByName(Seq(-999L).toDF("doc_id")))
    assert(sorted(again.terms) == sorted(rebuilt.terms))
    assert(sorted(again.stats) == sorted(rebuilt.stats))
    assert(sorted(again.postings) == sorted(rebuilt.postings))
  }

  test("textIndexUpsert equals rebuild-with frame-for-frame; new ids degrade to append") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit, not, concat, when}
    import graft.sources.Tables
    val docs = Tables(spark, SparkTest.sf).documents
    val touched = pmod(col("doc_id"), lit(4)) === 1
    // re-crawl a quarter with genuinely changed text
    val recrawled = docs.filter(touched)
      .select(col("doc_id"), concat(col("text"), lit(" zzz")).as("text"))
    val upserted = Keywords.textIndexUpsert(
      Keywords.textIndex(docs, col("doc_id"), col("text")),
      recrawled, col("doc_id"), col("text"))
    val rebuilt = Keywords.textIndex(
      docs.select(col("doc_id"),
        when(touched, concat(col("text"), lit(" zzz")))
          .otherwise(col("text")).as("text")),
      col("doc_id"), col("text"))
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(upserted.terms) == sorted(rebuilt.terms))
    assert(sorted(upserted.docs) == sorted(rebuilt.docs))
    assert(sorted(upserted.stats) == sorted(rebuilt.stats))
    assert(sorted(upserted.postings) == sorted(rebuilt.postings))
    val queries = Seq(("q1", "hash"), ("q2", "zzz")).toDF("query_id", "term")
    def rows(ix: Keywords.TextIndex) =
      Keywords.bm25AgainstIndex(ix, queries, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(rows(upserted) == rows(rebuilt) && rows(rebuilt).nonEmpty)
    // a mixed batch whose ids are NEW degrades to a plain append
    val fresh = Seq((900001L, "brand new crawl")).toDF("doc_id", "text")
    val mixed = Keywords.textIndexUpsert(rebuilt, fresh,
      col("doc_id"), col("text"))
    val appended = Keywords.textIndexAppend(rebuilt, fresh,
      col("doc_id"), col("text"))
    assert(sorted(mixed.terms) == sorted(appended.terms))
    assert(sorted(mixed.stats) == sorted(appended.stats))
  }

  test("textIndexSync advances v1's index to v2 exactly — adds, changes and removes") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit, concat, when}
    import graft.sources.Tables
    val v1 = Tables(spark, SparkTest.sf).documents.select(col("doc_id"), col("text"))
    val v2 = v1.filter(pmod(col("doc_id"), lit(7)) =!= 5)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 1, concat(col("text"), lit(" zzz")))
          .otherwise(col("text")).as("text"))
      .unionByName(v1.filter(pmod(col("doc_id"), lit(7)) === 2)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text")))
    val diff = graft.operators.Curation.corpusDiff(v1, v2,
      col("doc_id"), col("text"))
    val synced = Keywords.textIndexSync(
      Keywords.textIndex(v1, col("doc_id"), col("text")),
      diff, v2, col("doc_id"), col("text"))
    val rebuilt = Keywords.textIndex(v2, col("doc_id"), col("text"))
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(synced.terms) == sorted(rebuilt.terms))
    assert(sorted(synced.docs) == sorted(rebuilt.docs))
    assert(sorted(synced.stats) == sorted(rebuilt.stats))
    assert(sorted(synced.postings) == sorted(rebuilt.postings))
    // a diff frame without its contract columns fails fast
    val ex = intercept[IllegalArgumentException] {
      Keywords.textIndexSync(rebuilt, diff.drop("status"), v2,
        col("doc_id"), col("text"))
    }
    assert(ex.getMessage.contains("doc_id, status"))
  }

  test("textIndexRemove: full removal empties the index; legacy df-only index stays df-only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma alpha"),
      (3L, "beta delta")).toDF("doc_id", "text")
    val ix = Keywords.textIndex(docs, col("doc_id"), col("text"))
    val empty = Keywords.textIndexRemove(ix, Seq(1L, 2L, 3L).toDF("doc_id"))
    assert(empty.postings.count() == 0 && empty.terms.count() == 0 &&
      empty.docs.count() == 0)
    val st = empty.stats.collect().head
    assert(st.getLong(0) == 0L && st.getLong(1) == 0L,
      "an emptied index must read (0, 0), the coalesced-build contract")
    val legacy = ix.copy(terms = ix.terms.drop("ctf"))
    val prunedLegacy = Keywords.textIndexRemove(legacy, Seq(3L).toDF("doc_id"))
    assert(!prunedLegacy.terms.columns.contains("ctf"),
      "a df-only index must stay df-only after remove, not grow a NULL ctf")
    val rebuilt = Keywords.textIndex(docs.filter(col("doc_id") =!= 3L),
      col("doc_id"), col("text"))
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(prunedLegacy.terms) == sorted(rebuilt.terms.drop("ctf")))
    assert(sorted(prunedLegacy.docs) == sorted(rebuilt.docs))
  }

  test("textIndexAppend tolerates a legacy df-only index; QL falls back and matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Seq((1L, "alpha beta beta"), (2L, "gamma alpha")).toDF("doc_id", "text")
    val inc = Seq((3L, "beta delta")).toDF("doc_id", "text")
    val full = Keywords.textIndex(base.unionByName(inc), col("doc_id"), col("text"))
    val legacy0 = Keywords.textIndex(base, col("doc_id"), col("text"))
    val legacy = legacy0.copy(terms = legacy0.terms.drop("ctf")) // pre-ctf build
    val grown = Keywords.textIndexAppend(legacy, inc, col("doc_id"), col("text"))
    assert(!grown.terms.columns.contains("ctf"),
      "a df-only index must stay df-only after append, not half-merge")
    def sorted(f: org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sorted(grown.terms) == sorted(full.terms.drop("ctf")))
    // the QL search's postings fallback must equal the ctf-bearing path
    val queries = Seq(("q1", "beta"), ("q1", "delta")).toDF("query_id", "term")
    def rows(ix: Keywords.TextIndex) =
      Keywords.qlAgainstIndex(ix, queries, k = 3)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(rows(grown) == rows(full) && rows(full).nonEmpty)
  }

  test("invertedIndex: hand postings, df band edges, repeated phrase bills tf twice") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x y"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Keywords.invertedIndex(docs, col("doc_id"), col("text"),
        n = 2, minDf = 2, maxDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "a b" occurs twice in doc 1 (overlapping windows) and once in
    // doc 2: df counts DOCS, tf_total counts occurrences
    assert(got.toSeq == Seq(("a b", 2L, 3L, "1,2")), s"got ${got.toSeq}")
    // unigram grain + open band: every term indexed, hapax included
    val uni = Keywords.invertedIndex(docs, col("doc_id"), col("text"),
        n = 1, minDf = 1, maxDf = 100)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    // postings are DOC grain (one entry per doc, not per occurrence)
    assert(uni("a") == "1,2" && uni("x") == "3", s"got $uni")
  }

  test("fertilityBySource: carry rides without a join-back; zero-word source is NULL") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val train = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val merges = Keywords.bpeTrain(train, col("text"), 2)
    // srcA: "aaa aaaa" (2 words → 5 toks) + "aa" (1 word → 2 toks);
    // srcB: one empty doc → 0 words, NULL fertility
    val docs = Seq((1L, "aaa aaaa", "srcA"), (2L, "aa", "srcA"), (3L, "", "srcB"))
      .toDF("doc_id", "text", "source")
    val got = Keywords.fertilityBySource(docs, col("doc_id"), col("text"),
        col("source"), merges)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got("srcA") == ((2L, 3L, 7L, Some(round6(7.0 / 3)))), s"got ${got("srcA")}")
    assert(got("srcB") == ((1L, 0L, 0L, None)), s"got ${got("srcB")}")
    // carry names that collide with bpeApply outputs fail fast
    val ex = intercept[IllegalArgumentException] {
      Keywords.bpeApply(docs, col("doc_id"), col("text"), merges,
        carry = Seq("n_tokens" -> col("source")))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("fertilityBySourceJoined equals fertilityBySource row-for-row; carry rides the recovery join") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val train = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val merges = Keywords.bpeTrain(train, col("text"), 2)
    // srcB's only doc is zero-word: its source must survive the
    // id-keyed recovery join (the carry path the joined formulation
    // alone exercises)
    val docs = Seq((1L, "aaa aaaa", "srcA"), (2L, "aa", "srcA"), (3L, "", "srcB"))
      .toDF("doc_id", "text", "source")
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("source").collect().map(_.toSeq).toSeq
    val lit16 = rows(Keywords.fertilityBySource(docs, col("doc_id"), col("text"),
      col("source"), merges))
    val joined = rows(Keywords.fertilityBySourceJoined(docs, col("doc_id"),
      col("text"), col("source"), merges))
    assert(lit16.nonEmpty && joined == lit16)
    assert(joined.map(_.head).toSet == Set("srcA", "srcB"))
  }

  private def round6(d: Double): Double = math.rint(d * 1e6) / 1e6

  test("bpeApply merge order matters: later merges see earlier merges' symbols") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // train on "abab abab ab": (a,b)→ab wins round 1 (count 5); round 2
    // pairs over folded forms [ab,ab,</w>]×2 + [ab,</w>]: (ab,ab)=2,
    // (ab,</w>)=3 → (ab,</w>) wins. Applying BOTH to "ababab" must fold
    // round 1 first: [ab,ab,ab,</w>] → round 2 merges only the LAST pair.
    val train = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = Keywords.bpeTrain(train, col("text"), 2)
    val got = Keywords.bpeApply(Seq((1L, "ababab")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), merges).head()
    assert(got.getString(4) == "ab ab ab</w>", s"got ${got.getString(4)}")
  }

  test("bpeApplyJoined equals bpeApply row-for-row on a trained table (<=16 merges)") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.sources.Tables
    // the C153 formulation law: per-occurrence literal folding and
    // per-distinct-word joined folding are the same function of the
    // word — on the REAL corpus (unk words, repeated words, the lot)
    val docs = Tables(spark, SparkTest.sf).documents
    val merges = Keywords.bpeTrain(docs, col("text"), merges = 4)
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val lit16 = rows(Keywords.bpeApply(docs, col("doc_id"), col("text"), merges))
    val joined = rows(Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"), merges))
    assert(lit16.nonEmpty && joined == lit16)
  }

  test("bpeApplyJoined holds at a production-size merge table (>=32k merges)") {
    import SparkTest.spark
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.sources.Tables
    // the C153 claim at the shipped-tokenizer size: 32768 inert merges
    // over two-char symbols that can never be adjacent (initial symbols
    // are single code points; the inert pairs fire before any real
    // merge could build them) placed FIRST, the real word-chain table
    // renumbered AFTER them — the worst case for the kernel, which must
    // scan past all 32k no-ops before anything fires. Forward replay
    // makes the inert rows no-ops, so the 32k-table apply must equal
    // the real-table-only apply byte-for-byte — proving the 1-row
    // array broadcast, the kernel loop and the distinct-word join all
    // carry a production-size table.
    val docs = Tables(spark, SparkTest.sf).documents
    val real = Keywords.wordChainMerges(docs, col("text"), topWords = 64)
    val nJunk = 32768L
    val junk = spark.range(1, nJunk + 1).toDF("step")
      .select(col("step").cast("long").as("step"),
        concat(lit("#"), col("step").cast("string")).as("l_sym"),
        concat(lit("#"), col("step").cast("string")).as("r_sym"),
        concat(lit("#"), col("step").cast("string"), lit("#"),
          col("step").cast("string")).as("merged"))
    val big = junk.unionByName(
      real.select((col("step") + nJunk).as("step"),
        col("l_sym"), col("r_sym"), col("merged")))
    assert(big.count() >= 32768 + 64)
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expected = rows(Keywords.bpeApplyJoined(docs, col("doc_id"),
      col("text"), real))
    val got = rows(Keywords.bpeApplyJoined(docs, col("doc_id"),
      col("text"), big))
    assert(expected.nonEmpty && got == expected)
    // the real merges actually fired through the 32k table (fertility
    // below the char-level ceiling somewhere), so the equality is not
    // vacuous
    assert(got.exists(r => r(2).asInstanceOf[Long] < 2 * r(1).asInstanceOf[Long]),
      "no merge fired — the 32k law would be vacuously true")
  }

  test("bpeApplyJoined: hand segmentation, atomic unk, NULL text, empty table, carry guard") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val train = Seq((1L, "aaa aaa aa")).toDF("doc_id", "text")
    val merges = Keywords.bpeTrain(train, col("text"), 2)
    val docs = Seq((1L, "aaa aaaa"), (2L, "aa café"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getString(4))).toMap
    assert(got(1L) == ((2L, 5L, Some(2.5), "aa a</w> aa aa </w>")), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 3L, Some(1.5), "aa </w> café</w>")), s"got ${got(2L)}")
    assert(got(3L) == ((0L, 0L, None, "")), s"got ${got(3L)}")
    // empty merge table: every word stays char+1 pieces (no NPE on the
    // collected-empty array row)
    val none = Keywords.bpeApplyJoined(
      Seq((1L, "ab")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      merges.filter(col("step") < 0)).head()
    assert(none.getString(4) == "a b </w>", s"got ${none.getString(4)}")
    val ex = intercept[IllegalArgumentException] {
      Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"), merges,
        carry = Seq("wtoks" -> col("text")))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("bpeApplyJoined runs a 1000+-merge table past bpeApply's literal cap") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1 real chain + 1020 inert pad merges: the literal fold refuses,
    // the joined formulation segments under the full table — and the
    // firing merges still fire with 1000 dead rows around them
    val docs = Seq((1L, "abc zz")).toDF("doc_id", "text")
    val real = Keywords.wordChainMerges(docs, col("text"), topWords = 1)
    val pad = spark.range(1, 1021).toDF("k")
      .select((col("k") + 100).as("step"),
        concat(lit("#"), col("k")).as("l_sym"),
        concat(lit("#"), col("k")).as("r_sym"),
        concat(lit("#"), col("k"), lit("#"), col("k")).as("merged"))
    val table = real.unionByName(pad)
    assert(table.count() == 1023L) // 3 chain rows for "abc" + 1020 pad
    intercept[IllegalArgumentException] {
      Keywords.bpeApply(docs, col("doc_id"), col("text"), table)
    }
    val got = Keywords.bpeApplyJoined(docs, col("doc_id"), col("text"), table)
      .orderBy("doc_id").head()
    // "abc" fully merges to one token; "zz" (rank 2, no chain) stays chars
    assert(got.getString(4) == "abc</w> z z </w>", s"got ${got.getString(4)}")
  }

  test("wordChainMerges: rank order, chain shape, first-appearance dedupe") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // vocab: ab (2 occurrences, rank 1), aba (1, rank 2). aba's (a,b)
    // duplicates ab's chain head and must dedupe to ab's position.
    val docs = Seq((1L, "ab aba ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Keywords.wordChainMerges(docs, col("text"), topWords = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", "ab"), (2L, "ab", "</w>", "ab</w>"),
      (3L, "ab", "a", "aba"), (4L, "aba", "</w>", "aba</w>")), s"got ${got.toSeq}")
    // topWords cuts at the integer-exact (count desc, word asc) rank
    val one = Keywords.wordChainMerges(docs, col("text"), topWords = 1)
      .collect().map(_.getString(3))
    assert(one.toSeq == Seq("ab", "ab</w>"), s"got ${one.toSeq}")
  }

  test("bpeTrain stops early when the vocabulary runs out of pairs") {
    import SparkTest.spark
    import spark.implicits._
    // single 1-char word: round 1 merges (a,</w>); round 2 has no pairs
    val df = Seq((1L, "a a a")).toDF("doc_id", "text")
    val got = graft.functions.Keywords.bpeTrain(df, org.apache.spark.sql.functions.col("text"), 3)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq(("a", "</w>", 3L)), s"got ${got.toSeq}")
  }

  test("zipf fit recovers the exact two-point slope; empty corpus degrades honestly") {
    import spark.implicits._
    // tf 8 at rank 1, tf 4 at rank 2: real-math slope (ln4−ln8)/ln2 = −1;
    // in once-rounded micro-nats: (1386294−2079442)/693147 → −1.000001,
    // intercept = predicted y at rank 1 = 2079442 micro-nats. Exact.
    val df = Seq((1L, ("a " * 8 + "b " * 4).trim)).toDF("doc_id", "text")
    val row = Keywords.zipfFit(df, col("doc_id"), col("text")).head()
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2)) ==
      (2L, -1.000001, 2079442.0), s"got $row")

    // empty corpus: one honest row, no NaN/zero-division artifacts
    val empty = Keywords.zipfFit(
      df.filter(lit(false)), col("doc_id"), col("text")).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2),
      s"got $empty")

    // single-term corpus: the x-variance is zero — slope must be NULL,
    // not an infinity from 0/0
    val one = Keywords.zipfFit(
      Seq((1L, "a a a")).toDF("doc_id", "text"), col("doc_id"), col("text")).head()
    assert(one.getLong(0) == 1L && one.isNullAt(1), s"got $one")
  }

  test("bm25 ranks rarity, saturation and length; dedups repeated query terms") {
    import spark.implicits._
    val docs = Seq(
      1L -> "rare word filler filler filler filler filler filler", // rare ×1, long
      2L -> "rare word",                                           // rare ×1, short
      3L -> "word word word word word word word word",             // common only
      4L -> "other stuff entirely").toDF("doc_id", "text")
    def run(qs: Seq[(String, String)], k: Int = 10) =
      Keywords.bm25TopK(docs, col("doc_id"), col("text"),
          qs.toDF("query_id", "term"), k)
        .orderBy(col("query_id"), col("rank")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))

    // "rare" matches docs 1 and 2 only; equal tf=1 → the SHORTER doc
    // (2) wins on length normalization
    val rare = run(Seq("a" -> "rare"))
    assert(rare.map(t => (t._3)).toSeq == Seq(2L, 1L), s"got ${rare.toSeq}")

    // repeated query keyword must not double-bill: scores identical
    val once = run(Seq("a" -> "rare"))
    val twice = run(Seq("a" -> "rare", "a" -> "rare", "a" -> "RARE"))
    assert(once.map(_._5).toSeq == twice.map(_._5).toSeq)

    // a no-match term contributes nothing; the multi-term query still
    // retrieves on its real terms and n_hit_terms counts only matches
    val mixed = run(Seq("m" -> "zzz", "m" -> "rare", "m" -> "word"))
    assert(mixed.forall(_._4 <= 2), s"got ${mixed.toSeq}")
    assert(mixed.map(_._3).toSet == Set(1L, 2L, 3L))
    // doc 4 never appears for these queries
    assert(!mixed.exists(_._3 == 4L))

    // k truncates: with k=1 each query returns exactly its best doc
    assert(run(Seq("a" -> "rare", "b" -> "word"), k = 1).length == 2)
  }

  test("reference-LM JM scoring: in-distribution beats OOV, backoff stays finite") {
    import SparkTest.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ref = Seq("the cat sat on the mat",
      "the cat sat on the chair").toDF("text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),   // pure in-distribution
      (2L, "qq zz vv ww qq zz vv ww"),  // fully OOV: unigram backoff only
      (3L, "the cat sat on qq zz"),     // mixed
      (4L, ""), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.functions.Keywords.jmRefLogProb(docs, col("doc_id"),
        col("text"), ref, col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    // every doc present; featureless docs have zero sums and NULL mean
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    for (id <- Seq(4L, 5L)) assert(got(id) == ((0L, 0L, None)), s"$id: ${got(id)}")
    def mean(id: Long) = got(id)._2.toDouble / got(id)._1
    // in-distribution > mixed > fully-OOV, and even full OOV is FINITE
    // (the add-1 unigram term): an unsmoothed LM would have no score
    assert(mean(1L) > mean(3L) && mean(3L) > mean(2L),
      s"expected in-dist > mixed > OOV, got $got")
    assert(got(2L)._2 > Long.MinValue / 4, "OOV score must be finite")
    // lambda=1-epsilon ~ pure bigram; lambda near 0 ~ pure unigram:
    // the knob moves the score of a bigram-breaking doc
    val loLam = graft.functions.Keywords.jmRefLogProb(docs, col("doc_id"),
        col("text"), ref, col("text"), lambdaMicro = 100000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loLam(3L) != got(3L)._2, "lambda must change interpolated scores")
  }

  test("heavy hitters: exact result, partitioning-independent, threshold boundary") {
    import spark.implicits._
    // 100 tokens total: "hot" 40, "warm" 26, "cool" 25, 9 junk singletons.
    // budget=3 → threshold N/(b+1) = 25: strictly-above only, so "cool"
    // (exactly 25·4 = 100 = N, not >) must be EXCLUDED — the boundary is
    // the integer comparison, not a float ratio.
    // one token per ROW so repartition genuinely scatters the stream
    // across sketch partitions (a single concatenated row would land
    // every token in one MG instance and test nothing)
    val docs = (Seq.fill(40)("hot") ++ Seq.fill(26)("warm") ++ Seq.fill(25)("cool") ++
      (1 to 9).map(i => s"junk$i")).map(Tuple1(_)).toDF("text")
    for (parts <- Seq(1, 7)) {
      val got = Keywords.heavyHitters(docs.repartition(parts), col("text"), budget = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set(("hot", 40L, 0.4), ("warm", 26L, 0.26)),
        s"parts=$parts: $got")
    }
    // many-partition split of a multi-row frame: counts still exact
    val rows = ((1 to 50).map(_ => "alpha beta") ++ (1 to 30).map(_ => "alpha"))
      .map(Tuple1(_)).toDF("text").repartition(13)
    val got2 = Keywords.heavyHitters(rows, col("text"), budget = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // N=130: alpha 80 (>43.3), beta 50 (>43.3)
    assert(got2 == Set(("alpha", 80L), ("beta", 50L)), got2.toString)
    // null/empty text contribute nothing and don't crash the sketch
    val withNulls = Seq(Tuple1("x x x"), Tuple1(""), Tuple1(null.asInstanceOf[String]))
      .toDF("text")
    val got3 = Keywords.heavyHitters(withNulls, col("text"), budget = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got3 == Set(("x", 3L)), got3.toString)
  }

  test("Kneser-Ney: hand-computed probabilities, continuation backoff, empty docs") {
    import spark.implicits._
    // ref: bigrams (san,francisco) (san,diego) (los,angeles) — B=3,
    // V=5 types {san, francisco, diego, los, angeles} → B+V = 8
    val ref = Seq("san francisco", "san diego", "los angeles").map(Tuple1(_))
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val docs = Seq(
      1L -> "san francisco",  // seen bigram, seen context
      2L -> "francisco san",  // unseen context → pure continuation backoff
      3L -> "",               // no bigrams
      4L -> "solo").toDF("doc_id", "text")
    val got = Keywords.knRefLogProb(docs, col("doc_id"), col("text"),
        ref, col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))
      .toMap
    // doc 1: p = (1−0.75)/2 + (0.75·2/2)·((1+1)/(3+5)) = 0.125 + 0.1875
    //       = 0.3125 → round(ln(0.3125)·1e6) = −1163151
    assert(got(1L)._1 == 1L && got(1L)._2 == math.round(math.log(0.3125) * 1e6),
      s"${got(1L)}")
    // doc 2: context "francisco" has c1=0 → backoff; "san" completes no
    // bigram (cont=0) → p = (0+1)/(3+5) = 0.125
    assert(got(2L)._2 == math.round(math.log(0.125) * 1e6), s"${got(2L)}")
    // empty / one-token docs: 0 bigrams, NULL mean
    assert(got(3L) == ((0L, 0L, null)) && got(4L) == ((0L, 0L, null)))
  }

  test("Kneser-Ney continuation uses TYPE counts, not token frequency") {
    import spark.implicits._
    // "b" is 3× more frequent than "d" as a token, but each completes
    // exactly ONE distinct context — their continuation probabilities
    // are EQUAL, so a novel context scores them identically (the
    // distinction JM's frequency-weighted unigram term cannot draw)
    val ref = Seq("a b", "a b", "a b", "c d").map(Tuple1(_))
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val docs = Seq(1L -> "z b", 2L -> "z d").toDF("doc_id", "text")
    val got = Keywords.knRefLogProb(docs, col("doc_id"), col("text"),
        ref, col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == got(2L), s"$got")
    val jm = Keywords.jmRefLogProb(docs, col("doc_id"), col("text"),
        ref, col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(jm(1L) > jm(2L), s"JM should overrate the frequent token: $jm")
  }

  test("QL retrieval: term presence ranks first at equal length, OOV terms drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "needle filler filler filler"),
      (2L, "other filler filler filler"),   // same length, no needle
      (3L, "needle needle filler filler"))  // more needle mass
      .toDF("doc_id", "text")
    val qs = Seq(("q1", "needle"), ("q1", "unicorn")).toDF("query_id", "term")
    val got = Keywords.qlTopK(docs, col("doc_id"), col("text"), qs, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // OOV 'unicorn' dropped on both sides: n_hit_terms counts only 'needle'
    assert(got.forall(_._3 <= 1), s"OOV term leaked into hits: ${got.toSeq}")
    val order = got.sortBy(_._1).map(_._2).toSeq
    assert(order == Seq(3L, 1L, 2L),
      s"QL must rank by smoothed term mass, got $order")
  }

  test("RRF fusion: consensus beats a single-list winner, missing side adds 0") {
    import spark.implicits._
    // doc 5 is rank 2 in BOTH lists; docs 1/9 each win one list only.
    // 1/(60+2)+1/(60+2) > 1/(60+1)+0, so consensus must fuse first.
    val a = Seq(("q1", 1L, 1L), ("q1", 2L, 5L), ("q1", 3L, 7L))
      .toDF("query_id", "rank", "doc_id")
    val b = Seq(("q1", 1L, 9L), ("q1", 2L, 5L), ("q1", 3L, 8L))
      .toDF("query_id", "rank", "doc_id")
    val got = Keywords.rrfFuse(a, b, kRrf = 60, topK = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.head._2 == 5L, s"consensus doc must fuse first: ${got.toSeq}")
    // a doc present in one list scores exactly its single truncated term
    val single = got.find(_._2 == 7L).get._3
    assert(single == (1e9 / 63.0).toLong, s"one-sided contribution: $single")
    intercept[IllegalArgumentException] {
      Keywords.rrfFuse(a.drop("rank"), b)
    }
  }
}
