package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-line parsing and enhancement as pure Column expressions
  * (SURVEY.md §2.A1-A5).
  *
  * Re-expresses the reference's per-record decode step
  * (/root/reference/sender/firehose_sender.go:59-74, which delegates to
  * the public kayvee `decode.ParseAndEnhance`) as codegen'd Catalyst
  * expressions: everything here is `regexp_extract`/`get_json_object`/
  * string built-ins, so parsing stays inside whole-stage codegen and
  * scales linearly with no UDF serialization cost — the Spark-first
  * answer to the reference's per-line Go parsing loop.
  *
  * Two rsyslog shapes are supported (both appear in
  * /root/reference/sender/firehose_sender_test.go:29-43):
  *   - RFC3339:  `2017-08-16T04:37:52.901092+00:00 host prog[pid]: msg`
  *   - RFC3164:  `Apr  5 21:45:54 host prog[pid]: msg`
  * Program names carrying ECS metadata look like
  *   `production--haproxy-logs/arn%3Aaws%3Aecs%3A...%3Atask%2F<task-id>[pid]`
  * and yield container_env / container_app / container_task.
  */
object LogColumns {

  // The RFC3339 shape `timestamp host prog[pid]: message` is parsed by
  // graft.functions.SyslogParse (one-pass native expression, see
  // `parsed` below).

  /** RFC3164 `Mmm dd HH:MM:SS host prog[pid]: message`. */
  private val R3164 =
    "^([A-Z][a-z]{2} {1,2}\\d{1,2} \\d{2}:\\d{2}:\\d{2}) (\\S+) ([^\\[ ]+)\\[(\\d+)\\]: ?(.*)$"

  /** ""-guarded long cast: regexp_extract yields "" on no-match, which
    * ANSI mode would otherwise turn into a hard CAST error — a malformed
    * line must drop to null, not kill the job (the reference skips bad
    * records, firehose_sender.go:61-63). */
  private def safeLong(c: Column): Column =
    when(c === "", lit(null)).otherwise(c).cast("long")

  /** One-pass parse of the RFC3339 shape via the native SyslogParse
    * expression: the per-field accessors below all build the identical
    * `graft_syslog_parse(line)` subtree, which codegen subexpression
    * elimination computes ONCE per row — versus five separate regex
    * executions for five `regexp_extract(line, R3339, g)` nodes (they
    * differ in the group index, so CSE can't merge them). Same pattern,
    * same find()/""-on-no-match contract, identical outputs. */
  private def parsed(line: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_syslog_parse", line)

  def rawTimestamp3339(line: Column): Column = parsed(line).getField("ts")
  def hostname(line: Column): Column        = parsed(line).getField("host")
  def programname(line: Column): Column     = parsed(line).getField("prog")
  def pid(line: Column): Column             = safeLong(parsed(line).getField("pid"))
  def message(line: Column): Column         = parsed(line).getField("msg")

  def rawTimestamp3164(line: Column): Column = regexp_extract(line, R3164, 1)
  def hostname3164(line: Column): Column     = regexp_extract(line, R3164, 2)
  def programname3164(line: Column): Column  = regexp_extract(line, R3164, 3)
  def pid3164(line: Column): Column          = safeLong(regexp_extract(line, R3164, 4))
  def message3164(line: Column): Column      = regexp_extract(line, R3164, 5)

  /** RFC3164 timestamps carry no year; the reference's decoder assumes
    * the current year — callers inject it explicitly for determinism.
    * try_to_timestamp: a line matching neither shape must yield null,
    * not an ANSI cast error (the reference skips bad records). */
  def timestamp3164(line: Column, year: Int): Column =
    try_to_timestamp(concat(lit(s"$year "), rawTimestamp3164(line)),
      lit("yyyy MMM [ ]d HH:mm:ss"))

  // --- ECS program-name metadata (A3) ----------------------------------

  def containerEnv(prog: Column): Column = regexp_extract(prog, "^([^/]*?)--", 1)
  def containerApp(prog: Column): Column = regexp_extract(prog, "^[^/]*?--([^/]*)", 1)

  /** Task id: the part after `task/` in the URL-decoded ARN suffix.
    * try_url_decode: stray `%` in a garbage line must not abort the
    * pipeline. */
  def containerTask(prog: Column): Column =
    regexp_extract(
      coalesce(call_function("try_url_decode", regexp_extract(prog, "/(.*)$", 1)), lit("")),
      "task/(.*)$", 1)

  // --- kayvee payload (A2) ---------------------------------------------

  /** The embedded `{...}` JSON span of a message (greedy: first `{` to
    * last `}`), "" when absent — mirrors kayvee's payload scan. */
  def kayveePayload(msg: Column): Column = regexp_extract(msg, "(\\{.*\\})", 1)

  /** A single field of the kayvee payload as string (null if absent). */
  def kayveeField(msg: Column, field: String): Column =
    get_json_object(kayveePayload(msg), s"$$.$field")

  /** Log level with the reference's default: absent/empty → "debug"
    * (sender/stats/stats.go:53-56). */
  def level(msg: Column): Column = {
    val l = kayveeField(msg, "level")
    when(l.isNull || l === "", lit("debug")).otherwise(l)
  }

  /** container_app with the reference's `_UNKNOWN_` default
    * (sender/stats/stats.go:49-52). */
  def appOrUnknown(prog: Column): Column = {
    val a = containerApp(prog)
    when(a.isNull || a === "", lit("_UNKNOWN_")).otherwise(a)
  }

  // --- parse + enhance (A1/A4) -----------------------------------------

  /** The structured field names [[enhance]] adds beyond the `rawlog`
    * passthrough — the SINGLE definition shared by the forwarder's
    * NDJSON serializer and its metric leg's structured-field
    * whitelist (Forwarder.MetricStructuredFields). Keeping one list
    * means a new enhanced field can never silently fall back to
    * kayvee-payload resolution in the metric leg while the serializer
    * already emits it; LogColumnsSpec pins that `enhance`'s added
    * column set is exactly `rawlog` plus these names. */
  val EnhancedFieldNames: Seq[String] = Seq(
    "timestamp", "hostname", "programname", "pid", "container_env",
    "container_app", "container_task", "title", "level", "deploy_env")

  /** Full parse+enhance of a rsyslog line column — the batch/streaming-
    * shared core of the forwarder, mirroring the field surface of the
    * reference's ParseAndEnhance call. The line SHAPE is auto-detected
    * per record like the reference's decoder (both RFC3339 and RFC3164
    * forms appear in its test fixtures): when the one-pass 3339 parse
    * doesn't match, the 3164 extraction is used. `rfc3164Year` stands in
    * for the reference's current-year assumption (3164 timestamps carry
    * no year) — explicit for determinism. */
  def enhance(df: DataFrame, line: Column, deployEnv: String,
              rfc3164Year: Int = 2024): DataFrame = {
    val is3339 = hostname(line) =!= ""
    def pick(f3339: Column, f3164: Column): Column = when(is3339, f3339).otherwise(f3164)
    val prog = pick(programname(line), programname3164(line))
    val msg = pick(message(line), message3164(line))
    df.withColumn("rawlog", line)
      .withColumn("timestamp",
        when(is3339, try_to_timestamp(rawTimestamp3339(line)))
          .otherwise(timestamp3164(line, rfc3164Year)))
      .withColumn("hostname", pick(hostname(line), hostname3164(line)))
      .withColumn("programname", prog)
      .withColumn("pid", pick(pid(line), pid3164(line)))
      .withColumn("container_env", containerEnv(prog))
      .withColumn("container_app", appOrUnknown(prog))
      .withColumn("container_task", containerTask(prog))
      .withColumn("title", kayveeField(msg, "title"))
      .withColumn("level", level(msg))
      .withColumn("deploy_env", lit(deployEnv))
  }

  /** NDJSON serialization (A5): one JSON object per record, mirroring
    * firehose_sender.go:65-72 (json.Marshal + '\n' is the sink's framing;
    * the object itself is this column). */
  def toNdjson(cols: Column*): Column = to_json(struct(cols: _*))

  /** Multiline log-record reassembly (A15) — the stack-trace problem:
    * a Java/Python traceback arrives as one head line followed by N
    * continuation lines ("  at …", "  ... 3 more"), and every
    * line-oriented stage downstream (parse, dedup, routing) mangles
    * the record unless the lines are re-glued first. `isHead` is the
    * caller's head predicate (the universal heuristic: continuation
    * lines start with whitespace); each record is the head line plus
    * every following line up to the next head, WITHIN its file —
    * reassembly across file boundaries would be wrong, so `file`
    * partitions.
    *
    * Record ids come from a running count of heads per file — an
    * UnboundedPreceding..CurrentRow RUNNING frame partitioned by the
    * high-cardinality file key (the q07 class: streamed, never
    * whole-partition buffered). Orphan continuations BEFORE a file's
    * first head (a tail cut mid-record by rotation) carry record id 0
    * and are dropped — the documented contract; count them upstream
    * if loss auditing matters. Line order inside a record is pinned
    * by `offset` (byte offset / line number — unique within a file),
    * so the collect_list's arrival order never leaks into the glued
    * text.
    *
    * Returns `(file, head_off, n_lines, record)` — record = lines
    * joined by '\n'. Scale: one per-(file) window pass + one
    * per-record partial-agg shuffle; record size is bounded by the
    * true multiline record, not the file. */
  def reassembleMultiline(df: DataFrame, file: Column, offset: Column,
                          line: Column, isHead: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__file")).orderBy(col("__off"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(file.as("__file"), offset.as("__off"), line.as("__line"),
        isHead.cast("int").as("__h"))
      .withColumn("__rec", sum(col("__h")).over(w))
      .filter(col("__rec") > 0)
      .groupBy(col("__file"), col("__rec"))
      .agg(min(col("__off")).as("head_off"),
        count(lit(1)).as("n_lines"),
        array_join(transform(
          array_sort(collect_list(struct(col("__off"), col("__line")))),
          x => x.getField("__line")), "\n").as("record"))
      .select(col("__file").as("file"), col("head_off"), col("n_lines"),
        col("record"))
  }
}
