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
}
