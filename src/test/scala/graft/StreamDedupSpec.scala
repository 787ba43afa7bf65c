package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamDedup

class StreamDedupSpec extends AnyFunSuite {
  import SparkTest._

  test("unbounded stream dedup drops normalized dups across micro-batches") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    val out = StreamDedup.unbounded(mem.toDF().toDF("id", "text"), col("text"))
    val q = out.writeStream.format("memory").queryName("sd_unbounded")
      .outputMode("append").start()
    try {
      mem.addData(1L -> "Hello World", 2L -> "hello  world", 3L -> "other doc")
      q.processAllAvailable()
      // the dup arrives in a LATER micro-batch: state must carry over
      mem.addData(4L -> "HELLO WORLD ", 5L -> "fresh doc")
      q.processAllAvailable()
      val rows = spark.table("sd_unbounded")
        .select(col("id"), col("content_hash")).collect()
      assert(rows.length == 3)
      val ids = rows.map(_.getLong(0)).toSet
      assert(ids.intersect(Set(1L, 2L, 4L)).size == 1) // one copy of the dup group
      assert(ids.contains(3L) && ids.contains(5L))
    } finally q.stop()
  }

  test("watermarked dedup evicts state beyond the horizon: a late dup is re-admitted") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)](spark)
    val base = 1700000000000L
    val out = StreamDedup.withinWatermark(
      mem.toDF().toDF("id", "tsms", "text"),
      timestamp_millis(col("tsms")), col("text"), "10 seconds")
    val q = out.writeStream.format("memory").queryName("sd_evict")
      .outputMode("append").start()
    try {
      mem.addData((1L, base, "doc one"))
      q.processAllAvailable()
      // push the watermark far past base + delay so the key's state ages out
      mem.addData((2L, base + 60000, "advancer"))
      q.processAllAvailable()
      // the same content arrives again, well outside the 10 s horizon:
      // state was evicted, so it is re-admitted — the documented
      // bounded-state tradeoff (batch exactDedup is the backstop)
      mem.addData((3L, base + 61000, "doc one"))
      q.processAllAvailable()
      val ids = spark.table("sd_evict").select(col("id")).collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L), s"expected re-admission, got $ids")
    } finally q.stop()
  }

  test("watermarked stream dedup drops dups inside the horizon, keeps state keyed on hash only") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)](spark)
    val base = 1700000000000L
    val out = StreamDedup.withinWatermark(
      mem.toDF().toDF("id", "tsms", "text"),
      timestamp_millis(col("tsms")), col("text"), "10 seconds")
    val q = out.writeStream.format("memory").queryName("sd_wm")
      .outputMode("append").start()
    try {
      mem.addData((1L, base, "a b"), (2L, base + 1000, "A  b"), (3L, base + 2000, "c"))
      q.processAllAvailable()
      val rows = spark.table("sd_wm").select(col("id")).collect().map(_.getLong(0)).toSet
      assert(rows.size == 2)
      assert(rows.contains(3L))
      assert(rows.intersect(Set(1L, 2L)).size == 1)
      // schema carries the dedup key, not a second copy of the payload
      assert(spark.table("sd_wm").columns.contains("content_hash"))
    } finally q.stop()
  }

  test("streaming curation preprocess matches the batch composition row for row") {
    import spark.implicits._
    import graft.streaming.StreamCuration
    val gate = StreamCuration.GateConfig(
      minTokens = 5, maxTokens = 1000, minMeanLen = 1, maxMeanLen = 100,
      minStopwords = 1)
    val rows = Seq(
      (1L, "the cat and the dog sat on the mat with it and the hat"),
      (2L, "the caf\u00e9 menu was good and the staff were kind"), // composed
      (3L, "the cafe\u0301 menu was good and the staff were kind"), // decomposed
      (4L, "the broken � document has five tokens here"), // encoding gate drop
      (5L, "a b c"), // too few tokens: quality gate drop
      (6L, "contact me at bob@example.com for the files and the notes"))
    val static = rows.toDF("id", "text")
    val batchGated = StreamCuration.gateAndScrub(static, col("text"), gate)
    // delivered schema = input columns + clean: the gate's internal
    // measure/flag columns must not leak into every sink write
    assert(batchGated.columns.toSeq == Seq("id", "text", "clean"),
      s"got ${batchGated.columns.toSeq}")
    // a pre-existing clean column fails fast instead of being replaced
    val clash = intercept[IllegalArgumentException] {
      StreamCuration.gateAndScrub(static.withColumn("clean", col("text")),
        col("text"), gate)
    }
    assert(clash.getMessage.contains("clean"))
    val batchKept = batchGated
      .select(col("id"), col("clean")).collect()
    val batchIds = batchKept.map(_.getLong(0)).toSet
    assert(batchIds == Set(1L, 2L, 3L, 6L), s"batch gate kept $batchIds")
    val batchTexts = batchKept.map(_.getString(1)).toSet
    assert(batchTexts.size == 3, "NFC variants must normalize to one text")
    assert(batchTexts.exists(_.contains("<EMAIL>")), "PII must be redacted")
    assert(!batchTexts.exists(_.contains("bob@example.com")))

    val mem = MemoryStream[(Long, String)](spark)
    val out = StreamCuration.preprocess(mem.toDF().toDF("id", "text"),
      current_timestamp(), col("text"), gate, dedupWithin = None)
    val q = out.writeStream.format("memory").queryName("sc_preproc")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val delivered = spark.table("sc_preproc")
        .select(col("id"), col("clean")).collect()
      // gate parity: every delivered row passed the batch gate, and the
      // delivered TEXTS are exactly the batch's distinct clean texts
      // (the NFC pair collapsed to one delivery by the dedup tail)
      assert(delivered.map(_.getLong(0)).toSet.subsetOf(batchIds))
      assert(delivered.map(_.getString(1)).toSet == batchTexts,
        "streamed clean texts diverge from the batch composition")
      assert(delivered.length == 3, s"expected 3 deliveries, got ${delivered.length}")
    } finally q.stop()
  }
}
