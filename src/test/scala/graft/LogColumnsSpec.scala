package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.logs.LogColumns

/** Parser behavior pinned on the reference's own test inputs
  * (/root/reference/sender/firehose_sender_test.go:29-43). */
class LogColumnsSpec extends AnyFunSuite {
  import SparkTest._

  private val influxLine =
    "Apr  5 21:45:54 influx-service docker/0000aa112233[1234]: [httpd] 2017/04/05 " +
      "21:45:54 172.17.42.1 - heka [05/Apr/2017:21:45:54 +0000] POST " +
      "/write?db=foo&precision=ms HTTP/1.1 204 0 - Go 1.1 package http " +
      "123456-1234-1234-b11b-000000000000 13.688672ms"

  private val haproxyLine =
    "2017-08-16T04:37:52.901092+00:00 ip-10-0-102-159 production--haproxy-logs/" +
      "arn%3Aaws%3Aecs%3Aus-west-1%3A589690932525%3Atask%2F124cc8a5-0549-4149-922b-cd411b813d11" +
      "[3252]:  {\"timestamp\":1502858272,\"http_status\":200,\"request_method\":\"POST\"," +
      "\"response_time\":25,\"backend_name\":\"elasticsearch\"}"

  private def one(line: String) = {
    import spark.implicits._
    Seq(line).toDF("line")
  }

  test("RFC3164 line parses: host, prog, pid, message") {
    val r = one(influxLine).select(
      LogColumns.hostname3164(col("line")).as("h"),
      LogColumns.programname3164(col("line")).as("p"),
      LogColumns.pid3164(col("line")).as("pid"),
      LogColumns.message3164(col("line")).as("m")).head()
    assert(r.getString(0) == "influx-service")
    assert(r.getString(1) == "docker/0000aa112233")
    assert(r.getLong(2) == 1234L)
    assert(r.getString(3).startsWith("[httpd] 2017/04/05"))
  }

  test("RFC3164 timestamp parses with injected year") {
    val r = one(influxLine).select(
      LogColumns.timestamp3164(col("line"), 2017).cast("string").as("ts")).head()
    assert(r.getString(0) == "2017-04-05 21:45:54")
  }

  test("RFC3339 ECS line parses: hostname, pid, container metadata") {
    val line = col("line")
    val prog = LogColumns.programname(line)
    val r = one(haproxyLine).select(
      LogColumns.hostname(line),
      LogColumns.pid(line),
      LogColumns.containerEnv(prog),
      LogColumns.containerApp(prog),
      LogColumns.containerTask(prog)).head()
    assert(r.getString(0) == "ip-10-0-102-159")
    assert(r.getLong(1) == 3252L)
    assert(r.getString(2) == "production")
    assert(r.getString(3) == "haproxy-logs")
    assert(r.getString(4) == "124cc8a5-0549-4149-922b-cd411b813d11")
  }

  test("kayvee payload extraction + field access + level default") {
    val msg = LogColumns.message(col("line"))
    val r = one(haproxyLine).select(
      LogColumns.kayveeField(msg, "http_status").cast("long"),
      LogColumns.kayveeField(msg, "backend_name"),
      LogColumns.level(msg)).head()
    assert(r.getLong(0) == 200L)
    assert(r.getString(1) == "elasticsearch")
    assert(r.getString(2) == "debug") // absent level → reference default
  }

  test("enhance produces the full ParseAndEnhance field surface") {
    val df = LogColumns.enhance(one(haproxyLine), col("line"), "production")
    val r = df.select("hostname", "container_app", "container_task", "level", "deploy_env", "pid").head()
    assert(r.getString(0) == "ip-10-0-102-159")
    assert(r.getString(1) == "haproxy-logs")
    assert(r.getString(2) == "124cc8a5-0549-4149-922b-cd411b813d11")
    assert(r.getString(3) == "debug")
    assert(r.getString(4) == "production")
    assert(r.getLong(5) == 3252L)
  }

  test("non-ECS program name falls back to _UNKNOWN_ app") {
    val r = one(influxLine).select(
      LogColumns.appOrUnknown(LogColumns.programname3164(col("line")))).head()
    assert(r.getString(0) == "_UNKNOWN_")
  }

  test("malformed lines degrade to nulls/defaults, never abort the job") {
    import spark.implicits._
    val bad = Seq("total garbage no syslog shape", "", "x[notanum]: hi", "a b c%zz[1]: {broken")
      .toDF("line")
    val rows = LogColumns.enhance(bad, col("line"), "production")
      .select("pid", "container_app", "level", "timestamp").collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r.isNullAt(0) || r.getLong(0) == 1L))
    assert(rows.forall(_.getString(1) == "_UNKNOWN_"))
    assert(rows.forall(_.getString(2) == "debug"))
  }

  test("ndjson round-trips a record") {
    import spark.implicits._
    val df = Seq((1L, "hello")).toDF("id", "msg")
    val j = df.select(LogColumns.toNdjson(col("id"), col("msg")).as("j"))
      .select(get_json_object(col("j"), "$.id").cast("long"), get_json_object(col("j"), "$.msg"))
      .head()
    assert(j.getLong(0) == 1L && j.getString(1) == "hello")
  }

  test("multiline reassembly: glue order, file isolation, orphan drop") {
    import spark.implicits._
    val rows = Seq(
      // file a: head + 2 continuations, then a second single-line record
      ("a", 10L, "ERROR boom"),
      ("a", 11L, "  at Frame1"),
      ("a", 12L, "  at Frame2"),
      ("a", 20L, "INFO fine"),
      // file b: an orphan continuation BEFORE any head must be dropped,
      // and b's head must not absorb a's continuations
      ("b", 1L, "  at OrphanFrame"),
      ("b", 2L, "WARN later"),
      ("b", 3L, "  at Frame3"))
      .toDF("file", "off", "line")
    val got = LogColumns.reassembleMultiline(
        rows, col("file"), col("off"), col("line"),
        !col("line").startsWith(" "))
      .orderBy(col("file"), col("head_off"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("a", 10L, 3L, "ERROR boom\n  at Frame1\n  at Frame2"),
      ("a", 20L, 1L, "INFO fine"),
      ("b", 2L, 2L, "WARN later\n  at Frame3")), s"got ${got.toSeq}")
  }

  test("EnhancedFieldNames is exactly enhance's added column set") {
    // the coupling contract: the forwarder's serializer AND its metric
    // leg's structured-field whitelist both read EnhancedFieldNames,
    // and this pins that the list tracks what enhance actually builds —
    // grow enhance without growing the list and this fails
    val in = one(haproxyLine).withColumnRenamed("line", "value")
    val out = LogColumns.enhance(in, col("value"), "production")
    val added = out.columns.toSet -- in.columns.toSet
    assert(added == LogColumns.EnhancedFieldNames.toSet + "rawlog",
      s"enhance added $added but EnhancedFieldNames declares " +
        s"${LogColumns.EnhancedFieldNames.toSet}")
  }
}
