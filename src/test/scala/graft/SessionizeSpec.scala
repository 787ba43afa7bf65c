package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.Sessionize

class SessionizeSpec extends AnyFunSuite {
  import SparkTest._

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  test("stateful sessionization: in-batch gap close + watermark timeout close") {
    val in = Files.createTempDirectory("sess-in").toString
    val ck = Files.createTempDirectory("sess-ck").toString

    // file 1: user 1 has two sessions split by an in-batch 1h gap;
    // user 2 has one session that stays open
    Files.write(Paths.get(in, "a.json"), Seq(
      """{"user_id":1,"ts":"2024-01-01T00:00:00Z"}""",
      """{"user_id":1,"ts":"2024-01-01T00:00:10Z"}""",
      """{"user_id":1,"ts":"2024-01-01T01:30:00Z"}""",
      """{"user_id":2,"ts":"2024-01-01T00:05:00Z"}""").asJava)
    // files 2/3: sentinels push the watermark far past everyone's gap —
    // timeouts only fire in a batch AFTER the watermark advances, hence two
    Files.write(Paths.get(in, "b.json"), Seq(
      """{"user_id":99,"ts":"2024-01-01T08:00:00Z"}""").asJava)
    Files.write(Paths.get(in, "c.json"), Seq(
      """{"user_id":99,"ts":"2024-01-01T09:00:00Z"}""").asJava)

    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = Sessionize.sessions(events, gapSeconds = 1800, watermarkDelay = "1 minute")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("sessions_test").start()
    q.awaitTermination()

    val got = spark.table("sessions_test")
      .filter(col("user_id") < 99)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1: first session (2 events) closed by the in-batch gap, second
    // (1 event) closed by timeout; user 2: closed by timeout
    assert(got == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }
}
