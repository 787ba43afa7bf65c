package graft.logs

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed queries for the log-ETL surface (SURVEY.md §2.A).
  *
  * The driver provides no raw-log table, so these queries synthesize
  * deterministic rsyslog lines from `events` with identical string
  * construction on the Spark and DuckDB sides, then run the LIBRARY's
  * parse path (LogColumns) on the Spark side against plain-SQL regexp
  * extraction on the DuckDB side — the parser itself is what's being
  * oracle-checked.
  */
object LogQueries {

  /** Deterministic rsyslog lines from events: RFC3339 ts, ECS-style
    * program name carrying env/app/task, kayvee JSON payload. */
  private def lines(t: Tables): DataFrame = {
    // repartition before the per-line construction + downstream regex
    // parse so the map stages parallelize by cluster size even when the
    // events input is one small file
    val e = t.events.repartition(col("event_id"))
      .withColumn("ts_us", expr("ts div 1000"))
    val k = get_json_object(col("props"), "$.k").cast("long")
    val lvl = when(col("event_type") === "error", lit("error")).otherwise(lit("info"))
    e.select(
      col("event_id"), col("user_id"), col("event_type"),
      concat(
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd'T'HH:mm:ss"), lit("+00:00"),
        lit(" host-"), col("user_id").cast("string"),
        lit(" production--app"), (col("user_id") % 3).cast("string"),
        lit("/arn%3Aaws%3Aecs%3Aus-west-1%3A589690932525%3Atask%2Ft-"), col("event_id").cast("string"),
        lit("["), (col("event_id") % 4999).cast("string"), lit("]: "),
        lit("{\"title\":\""), col("event_type"),
        lit("\",\"level\":\""), lvl,
        lit("\",\"k\":"), k.cast("string"), lit("}")).as("line"))
  }

  /** DuckDB mirror of the line construction (shared CTE). */
  private val LinesCte = """
    WITH lines AS (
      SELECT event_id, user_id, event_type,
        strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%dT%H:%M:%S') || '+00:00'
        || ' host-' || CAST(user_id AS VARCHAR)
        || ' production--app' || CAST(user_id % 3 AS VARCHAR)
        || '/arn%3Aaws%3Aecs%3Aus-west-1%3A589690932525%3Atask%2Ft-' || CAST(event_id AS VARCHAR)
        || '[' || CAST(event_id % 4999 AS VARCHAR) || ']: '
        || '{"title":"' || event_type
        || '","level":"' || (CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END)
        || '","k":' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) || '}'
        AS line
      FROM events)"""

  // A1+A2+A3: full parse of every syslog component + ECS metadata +
  // kayvee fields, recovered per line.
  val qParse = Q(
    "qlog_syslog_parse",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val line = col("line")
      val prog = LogColumns.programname(line)
      val msg  = LogColumns.message(line)
      val task = LogColumns.containerTask(prog)
      lines(Tables(s, dir)).select(
        regexp_extract(task, "^t-(\\d+)$", 1).cast("long").as("event_id"),
        LogColumns.hostname(line).as("host"),
        LogColumns.containerEnv(prog).as("cenv"),
        LogColumns.appOrUnknown(prog).as("app"),
        task.as("task"),
        LogColumns.pid(line).as("pid"),
        LogColumns.kayveeField(msg, "title").as("title"),
        LogColumns.level(msg).as("level"),
        LogColumns.kayveeField(msg, "k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    Some(LinesCte + """
      , p AS (
        SELECT
          regexp_extract(line, '^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: ?(.*)$', 2) AS host,
          regexp_extract(line, '^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: ?(.*)$', 3) AS prog,
          CAST(regexp_extract(line, '^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: ?(.*)$', 4) AS BIGINT) AS pid,
          regexp_extract(line, '^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: ?(.*)$', 5) AS msg
        FROM lines),
      q AS (
        SELECT host, pid,
          regexp_extract(prog, '^([^/]*?)--', 1) AS cenv,
          regexp_extract(prog, '^[^/]*?--([^/]*)', 1) AS app,
          regexp_extract(replace(replace(regexp_extract(prog, '/(.*)$', 1), '%3A', ':'), '%2F', '/'), 'task/(.*)$', 1) AS task,
          json_extract_string(regexp_extract(msg, '(\{.*\})', 1), '$.title') AS title,
          json_extract_string(regexp_extract(msg, '(\{.*\})', 1), '$.level') AS level,
          CAST(json_extract_string(regexp_extract(msg, '(\{.*\})', 1), '$.k') AS BIGINT) AS k
        FROM p)
      SELECT CAST(regexp_extract(task, '^t-(\d+)$', 1) AS BIGINT) AS event_id,
             host, cenv, app, task, pid, title, level, k
      FROM q
      ORDER BY event_id"""))

  // A11 (batch analogue): the reference's drop-stats — per-minute counts
  // grouped by container_app and level, with _UNKNOWN_/debug defaults
  // (sender/stats/stats.go:18-58).
  val qDropStats = Q(
    "qlog_drop_stats",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val line = col("line")
      lines(Tables(s, dir)).select(
          substring(LogColumns.rawTimestamp3339(line), 1, 16).as("minute"),
          LogColumns.appOrUnknown(LogColumns.programname(line)).as("app"),
          LogColumns.level(LogColumns.message(line)).as("level"))
        .groupBy(col("minute"), col("app"), col("level"))
        .agg(count(lit(1)).as("n_dropped"))
        .orderBy(col("minute"), col("app"), col("level"))
    },
    Some(LinesCte + """
      SELECT substr(regexp_extract(line, '^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: ?(.*)$', 1), 1, 16) AS minute,
             regexp_extract(line, '^[^/]*?--([^/]*)', 1) AS app,
             json_extract_string(regexp_extract(line, '(\{.*\})', 1), '$.level') AS level,
             COUNT(*) AS n_dropped
      FROM lines
      GROUP BY 1, 2, 3
      ORDER BY minute, app, level"""))

  // A5: NDJSON serialize → reparse roundtrip; the DuckDB side reads the
  // same fields straight from events, so the oracle pins the roundtrip
  // to the source values.
  val qNdjson = Q(
    "qlog_ndjson_roundtrip",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.events.repartition(col("event_id"))
      val enhanced = e.select(
        col("event_id"),
        col("event_type").as("title"),
        when(col("event_type") === "error", lit("error")).otherwise(lit("info")).as("level"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      val nd = enhanced.select(
        LogColumns.toNdjson(col("event_id"), col("title"), col("level"), col("k")).as("json"))
      nd.select(
          get_json_object(col("json"), "$.event_id").cast("long").as("event_id"),
          get_json_object(col("json"), "$.title").as("title"),
          get_json_object(col("json"), "$.level").as("level"),
          get_json_object(col("json"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, event_type AS title,
             CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END AS level,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      ORDER BY event_id"""))

  // A12 (driver-gated): kvconfig routing end-to-end in batch — the
  // config text is parsed by Routing.parseKvConfig (the same reader the
  // streaming forwarder uses, shaped like /root/reference/kvconfig.yml)
  // and compiled to the first-match-wins route Column; the oracle
  // re-expresses the matcher table as a CASE over the same parsed
  // fields. Exercises multi-field AND matchers, value lists, and the
  // default fallthrough.
  private val RoutingCfg = """
routes:
  error-alerts:
    matchers:
      level: ["error"]
  app0-traffic:
    matchers:
      app: ["app0", "app1"]
"""

  val qRouting = Q(
    "qlog_routing",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val line = col("line")
      val parsed = lines(Tables(s, dir)).select(
        LogColumns.appOrUnknown(LogColumns.programname(line)).as("app"),
        LogColumns.level(LogColumns.message(line)).as("level"))
      val route = graft.streaming.Routing.column(
        graft.streaming.Routing.parseKvConfig(RoutingCfg), default = "main")
      parsed.withColumn("route", route)
        .groupBy(col("route")).agg(count(lit(1)).as("n_records"))
        .orderBy(col("route"))
    },
    Some(LinesCte + """
      , f AS (
        SELECT regexp_extract(line, '^[^/]*?--([^/]*)', 1) AS app,
               json_extract_string(regexp_extract(line, '(\{.*\})', 1), '$.level') AS level
        FROM lines)
      SELECT CASE WHEN level IN ('error') THEN 'error-alerts'
                  WHEN app IN ('app0', 'app1') THEN 'app0-traffic'
                  ELSE 'main' END AS route,
             COUNT(*) AS n_records
      FROM f
      GROUP BY 1
      ORDER BY route"""))

  /** A14: rate-spike detection — the alerting read of the drop-stats
    * surface, over the same app grain the lines carry (user_id % 3)
    * at 10-minute buckets; z-cut k = 2. ~190 of ~2 300 buckets per
    * app flag at sf0.01, so both verdict branches are non-vacuous.
    * The oracle mirrors the exact-moment arithmetic term for term
    * (including the var-clamp before sqrt). */
  val qSpikes = Q(
    "qlog_spikes",
    (s, dir) =>
      graft.streaming.DropStats.rateSpikes(
          Tables(s, dir).events,
          concat(lit("app"), (col("user_id") % 3).cast("string")),
          expr("(ts div 1000) div 600000000"),
          k = 2.0)
        .orderBy(col("grp"), col("bucket")),
    Some("""
      WITH c AS (SELECT 'app' || CAST(user_id % 3 AS VARCHAR) AS grp,
                   epoch_us(ts) // 600000000 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
                 FROM events GROUP BY 1, 2),
      m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(n) AS BIGINT) AS s1,
                   CAST(SUM(n * n) AS BIGINT) AS s2
            FROM c GROUP BY grp),
      x AS (SELECT grp, nb, CAST(s1 AS DOUBLE) / nb AS mean_r,
              sqrt(greatest(CAST(s2 AS DOUBLE) / nb
                - (CAST(s1 AS DOUBLE) / nb) * (CAST(s1 AS DOUBLE) / nb),
                0.0)) AS sd_r
            FROM m)
      SELECT c.grp, c.bucket, c.n,
             ROUND(mean_r, 6) AS mean_n,
             ROUND(sd_r, 6) AS sd_n,
             CAST(c.n AS DOUBLE) > mean_r + 2.0 * sd_r AS spike
      FROM c JOIN x USING (grp)
      ORDER BY grp, bucket"""))

  /** A16: CUSUM level-shift detection — the drift alarm next to A14's
    * spike rule. The fixture plants a real changepoint: every 'error'
    * event from Jan 22 on is replayed once, doubling that group's
    * bucket rate for the last ~9 of 30 days, while the other event
    * types stay flat. CUSUM accumulates the excess and latches
    * `shifted` for the error group shortly after the cutoff; flat
    * groups never cross (both verdict branches non-vacuous at every
    * sf — the time span is 30 days at all scales). The oracle mirrors
    * the closed form (running sum + running min over the same sort)
    * term-for-term in exact integers. */
  val qCusum = Q(
    "qlog_cusum",
    (s, dir) => {
      val e = Tables(s, dir).events
        .select(col("event_type"), expr("ts div 1000").as("us"))
      val burst = e.filter(col("event_type") === "error" &&
        col("us") >= lit(1705881600000000L))
      graft.streaming.DropStats.cusumShift(
          e.unionAll(burst), col("event_type"),
          expr("us div 600000000"), slack = 1L, threshold = 15L)
        .orderBy(col("grp"), col("bucket"))
    },
    Some("""
      WITH base AS (SELECT event_type, epoch_us(ts) AS us FROM events),
      inp AS (SELECT * FROM base
              UNION ALL
              SELECT * FROM base
              WHERE event_type = 'error' AND us >= 1705881600000000),
      c AS (SELECT event_type AS grp, us // 600000000 AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM inp GROUP BY 1, 2),
      r AS (SELECT grp, SUM(n) // COUNT(*) AS ref FROM c GROUP BY grp),
      p AS (SELECT c.grp, bucket, n, ref,
              SUM(n - ref - 1) OVER (PARTITION BY c.grp ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS pp
            FROM c JOIN r USING (grp)),
      m AS (SELECT grp, bucket, n, ref, pp,
              MIN(pp) OVER (PARTITION BY grp ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS mp
            FROM p)
      SELECT grp, bucket, n, CAST(ref AS BIGINT) AS ref,
             CAST(pp - least(mp, 0) AS BIGINT) AS cusum,
             (pp - least(mp, 0)) >= 15 AS shifted
      FROM m
      ORDER BY grp, bucket"""))

  /** A17: seasonal-naive residual anomaly — same-bucket-yesterday
    * comparison (lag = 144 ten-minute buckets) with a 3σ cut on the
    * residuals. The fixture plants a one-hour 4× burst in the error
    * group (Jan 25 10:00-11:00, three replays of each event): those
    * buckets flag against their previous-day baseline, the echo
    * buckets a day later flag negative (|resid| — a vanished burst is
    * as anomalous as an arrived one), and the first day's buckets
    * carry a NULL verdict (no baseline exists — stated, not zeroed).
    * Oracle mirrors the lag self-join and the residual-moment tree. */
  val qSeasonal = Q(
    "qlog_seasonal",
    (s, dir) => {
      val e = Tables(s, dir).events
        .select(col("event_type"), expr("ts div 1000").as("us"))
      val burst = e.filter(col("event_type") === "error" &&
        col("us") >= lit(1706176800000000L) && col("us") < lit(1706180400000000L))
      val input = e.unionAll(burst).unionAll(burst).unionAll(burst)
      graft.streaming.DropStats.seasonalResiduals(
          input, col("event_type"), expr("us div 600000000"),
          lag = 144L, k = 3.0)
        .orderBy(col("grp"), col("bucket"))
    },
    Some("""
      WITH base AS (SELECT event_type, epoch_us(ts) AS us FROM events),
      b1 AS (SELECT * FROM base
             WHERE event_type = 'error'
               AND us >= 1706176800000000 AND us < 1706180400000000),
      inp AS (SELECT * FROM base
              UNION ALL SELECT * FROM b1
              UNION ALL SELECT * FROM b1
              UNION ALL SELECT * FROM b1),
      c AS (SELECT event_type AS grp, us // 600000000 AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM inp GROUP BY 1, 2),
      r AS (SELECT c.grp, c.bucket, c.n, p.n AS n_prev,
              c.n - p.n AS resid
            FROM c LEFT JOIN c p
              ON p.grp = c.grp AND p.bucket = c.bucket - 144),
      m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS nb,
              CAST(SUM(resid) AS BIGINT) AS s1,
              CAST(SUM(resid * resid) AS BIGINT) AS s2
            FROM r WHERE resid IS NOT NULL GROUP BY grp),
      x AS (SELECT grp, CAST(s1 AS DOUBLE) / nb AS mean_r,
              sqrt(greatest(CAST(s2 AS DOUBLE) / nb
                - (CAST(s1 AS DOUBLE) / nb) * (CAST(s1 AS DOUBLE) / nb),
                0.0)) AS sd_r
            FROM m)
      SELECT r.grp, r.bucket, r.n, r.n_prev, CAST(r.resid AS BIGINT) AS resid,
             ROUND(x.mean_r, 6) AS mean_r, ROUND(x.sd_r, 6) AS sd_r,
             CASE WHEN r.resid IS NULL THEN NULL
                  ELSE abs(CAST(r.resid AS DOUBLE) - x.mean_r) > 3.0 * x.sd_r
             END AS anomalous
      FROM r JOIN x USING (grp)
      ORDER BY grp, bucket"""))

  /** A15: multiline record reassembly — error events expand to a
    * 3-line stack-trace shape (head + "  at …" + "  ... 3 more"),
    * interleaved with every other event's single head line at
    * deterministic per-file offsets (event_id·3 within the per-user
    * file — a partition key that scales with the corpus, not a
    * fixed fan-in), then re-glued by [[LogColumns.reassembleMultiline]]
    * with the whitespace-prefix head heuristic. The oracle rebuilds
    * the same corpus and reassembles it with the window-sum +
    * ordered string_agg equivalent — so the head detection, the
    * running record ids, and the byte-exact glued text are all what
    * the hash-match proves. */
  val qMultiline = Q(
    "qlog_multiline",
    (s, dir) => {
      val l = lines(Tables(s, dir))
      val file = concat(lit("f"), col("user_id").cast("string"))
      val heads = l.select(file.as("file"), (col("event_id") * 3).as("off"),
        col("line"))
      val errs = l.filter(col("event_type") === "error")
      val conts = errs.select(file.as("file"), (col("event_id") * 3 + 1).as("off"),
          concat(lit("  at com.example.Handler(Handler.scala:"),
            pmod(col("event_id"), lit(97)).cast("string"), lit(")")).as("line"))
        .unionAll(errs.select(file.as("file"), (col("event_id") * 3 + 2).as("off"),
          lit("  ... 3 more").as("line")))
      LogColumns.reassembleMultiline(
          heads.unionAll(conts), col("file"), col("off"), col("line"),
          !col("line").startsWith(" "))
        .orderBy(col("file"), col("head_off"))
    },
    Some(LinesCte + """,
      heads AS (SELECT 'f' || CAST(user_id AS VARCHAR) AS file,
                  event_id * 3 AS off, line
                FROM lines),
      conts AS (
        SELECT 'f' || CAST(user_id AS VARCHAR) AS file,
               event_id * 3 + 1 AS off,
               '  at com.example.Handler(Handler.scala:'
                 || CAST(event_id % 97 AS VARCHAR) || ')' AS line
        FROM lines WHERE event_type = 'error'
        UNION ALL
        SELECT 'f' || CAST(user_id AS VARCHAR), event_id * 3 + 2,
               '  ... 3 more'
        FROM lines WHERE event_type = 'error'),
      al AS (SELECT * FROM heads UNION ALL SELECT * FROM conts),
      rec AS (SELECT file, off, line,
                SUM(CASE WHEN line NOT LIKE ' %' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY file ORDER BY off
                        ROWS UNBOUNDED PRECEDING) AS rec
              FROM al)
      SELECT file, MIN(off) AS head_off, CAST(COUNT(*) AS BIGINT) AS n_lines,
             string_agg(line, chr(10) ORDER BY off) AS record
      FROM rec WHERE rec > 0
      GROUP BY file, rec
      ORDER BY file, head_off"""))

  val all: Seq[Q] = Seq(qParse, qDropStats, qNdjson, qRouting, qSpikes, qCusum, qSeasonal, qMultiline)
}
