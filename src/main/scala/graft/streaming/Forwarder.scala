package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.logs.LogColumns
import graft.sinks.{Delivery, FileDelivery, NdjsonBatchSink, SinkConfig}

/** The end-to-end forwarder (SURVEY.md §2.A13): the reference's
  * consume → ParseAndEnhance → NDJSON → batched-deliver pipeline
  * (/root/reference/main.go) as a Structured Streaming job.
  *
  * Source rate limiting (A9) maps to `maxFilesPerTrigger`; KCL
  * checkpointing (A10) maps to `checkpointLocation` (offset tracking +
  * replay on restart); routing (A12) is a Column producing the target
  * stream name per record (the reference's tags,
  * firehose_sender.go:73).
  */
object Forwarder {

  /** Near-duplicate replay screen (C18's big sibling): drop batch
    * records whose `column` text is a near-dup (MinHash-LSH + exact
    * Jaccard ≥ threshold) of a document in a prebuilt
    * [[graft.operators.Dedup.minhashIndex]] table at `indexDir` —
    * replay protection BEYOND the exact-hash `dedupWithin` (a replay
    * whose serialized form drifted — regenerated timestamps, reworded
    * wrapper — hashes differently but still near-dups its original).
    * (n, bands·rows, seed) MUST match the index build. Runs inside
    * foreachBatch (the LSH screen self-joins and repartitions — batch
    * operations), so it sees the POST-scrub record when `scrubPii` is
    * on: build the index from the DELIVERED history and both sides of
    * the compare are the same text domain. */
  final case class NearDupScreen(
      indexDir: String,
      column: String = "rawlog",
      n: Int = 2, bands: Int = 16, rows: Int = 4,
      threshold: Double = 0.5, seed: Long = 42L, maxBucket: Int = 1000)

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      deployEnv: String = "production",
      streamName: String = "main",
      maxFilesPerTrigger: Int = 10,
      sink: SinkConfig = SinkConfig(),
      /** e.g. Some(NearDupScreen(dir)): screen each micro-batch against
        * a materialized historical MinHash index before delivery. */
      nearDupScreen: Option[NearDupScreen] = None,
      /** e.g. Some("10 minutes"): drop records whose EXACT serialized
        * form was already delivered within the horizon — replay
        * protection for at-least-once consumers (KCL redelivers on
        * lease failover). Keys on md5 of the raw json (no text
        * normalization — distinct records differing only in case or
        * whitespace are NOT replays). Malformed lines (null parsed
        * timestamp) bypass the dedup and are always delivered. State
        * is md5 keys only, evicted by watermark. */
      dedupWithin: Option[String] = None,
      /** Redact emails/phones/URLs from the free-text fields (title,
        * rawlog) before delivery — the standard compliance step when
        * forwarding logs to a less-trusted store. Same codegen
        * redaction chain as the batch curation surface, with the
        * LOG-SAFE phone variant (the plain pattern would redact every
        * ISO date in rawlog as a phone). Applied LAST in the pipeline:
        * routing matches and the `dedupWithin` replay key both see the
        * PRE-scrub record, so a route keyed on URL/digit-shaped text
        * keeps matching and two distinct records that differ only in
        * redacted PII are never collapsed as replays. Structured
        * fields (host, app, timestamps) are never touched. */
      scrubPii: Boolean = false)

  /** The batch/streaming-shared transform: raw `value` lines →
    * enhanced fields + (stream, json) delivery columns. Routing
    * defaults to one stream; pass e.g.
    * `when(col("level") === "error", lit("errors")).otherwise(lit("main"))`
    * to demux. */
  def transform(lines: DataFrame, deployEnv: String,
                route: Column): DataFrame = {
    graft.GraftExtensions.ensureRegistered(lines.sparkSession)
    val enhanced = LogColumns.enhance(lines, col("value"), deployEnv)
    enhanced.withColumn("stream", route)
      .withColumn("json", serialized)
  }

  private def serialized: Column = LogColumns.toNdjson(
    (LogColumns.EnhancedFieldNames.map(col) :+ col("rawlog")): _*)

  /** The delivery-time scrub (see Config.scrubPii): rewrite the
    * free-text fields with the log-safe redaction chain and
    * RE-serialize, so the delivered NDJSON never carries the raw
    * values — while everything upstream (routing, replay dedup)
    * operated on the pre-scrub record. */
  private[streaming] def scrubDelivery(df: DataFrame): DataFrame =
    df.withColumn("title", graft.functions.TextFunctions.redactPiiLogSafe(col("title")))
      .withColumn("rawlog", graft.functions.TextFunctions.redactPiiLogSafe(col("rawlog")))
      .withColumn("json", serialized)

  /** The route-output METRIC leg (A18 — the reference's alerts shape,
    * /root/reference/kvconfig.yml:5-10, applied to the FORWARDED
    * stream): records whose matched route declares an `output:` block
    * are delivered as metric POINTS — the json column becomes
    * `{series, value, dimensions, stat_type}` with `value` read from
    * the record's `value_field` and each dimension name resolved to
    * that record field's value — instead of the plain NDJSON record.
    * This closes the reference's own loop: its stats goroutine logs
    * the per-minute drop-stats rollup as a LOG LINE
    * (stats.go:31-38, `log.TraceD("drop-stats", tmp)`) that the
    * forwarder then routes to the alert sink as a gauge point on
    * `total_dropped`. Field resolution prefers the enhanced STRUCTURED
    * column when the frame carries it (title, level, container_app, …)
    * and falls back to the record's kayvee payload
    * (`kayveeField(rawlog, name)`) — which is where `total_dropped`
    * lives. Routes without an output block keep their plain NDJSON
    * json untouched; everything still flows through the ONE
    * NdjsonBatchSink seam (batching/retry/DLQ identical for points
    * and records). Pure codegen column rewrites — the leg adds no
    * shuffle and no second delivery pass.
    *
    * Structured resolution consults ONLY the record's own enhanced
    * fields ([[MetricStructuredFields]]) — never the pipeline's
    * bookkeeping columns (value/rawlog/json/stream/content_hash),
    * which would silently shadow a same-named kayvee payload field
    * (a payload field literally named `stream` must read the payload,
    * not the router's column). A record whose value_field resolves
    * NULL (absent, or non-numeric) is delivered as the PLAIN NDJSON
    * record, never as a point missing its `value` key — to_json drops
    * null fields, and a value-less point is a silently malformed
    * delivery where the full record is at least diagnosable.
    * Derived from [[LogColumns.EnhancedFieldNames]] — the one list the
    * serializer also reads — so growing `enhance` grows this whitelist
    * in lockstep instead of silently diverging. */
  private[streaming] val MetricStructuredFields: Set[String] =
    LogColumns.EnhancedFieldNames.toSet

  private[streaming] def metricJson(df: DataFrame,
                                    routes: Seq[Routing.Route]): DataFrame = {
    val withOut = routes.filter(_.output.isDefined)
    if (withOut.isEmpty) df
    else {
      val stringFields = df.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.StringType &&
          MetricStructuredFields(f.name) => f.name
      }.toSet
      def fieldValue(name: String): Column =
        if (name.isEmpty) lit(null).cast("string")
        else if (stringFields(name)) col(name)
        else LogColumns.kayveeField(col("rawlog"), name)
      def valueOf(o: Routing.Output): Column =
        fieldValue(o.valueField).cast("double")
      def pointOf(o: Routing.Output): Column = to_json(struct(
        lit(o.series).as("series"),
        valueOf(o).as("value"),
        map_from_arrays(
            array(o.dimensions.map(lit): _*).cast("array<string>"),
            array(o.dimensions.map(fieldValue): _*).cast("array<string>"))
          .as("dimensions"),
        lit(o.statType).as("stat_type")))
      df.withColumn("json",
        withOut.foldRight(col("json")) { (r, acc) =>
          when(col("stream") === r.name && valueOf(r.output.get).isNotNull,
              pointOf(r.output.get))
            .otherwise(acc)
        })
    }
  }

  /** Start the streaming forwarder. The record source defaults to
    * [[FileLinesSource]] over `conf.inputDir`; pass any other
    * [[RecordSource]] to swap the consumer without touching the
    * pipeline — the same seam where the reference wires its KCL batch
    * consumer to the sender (/root/reference/main.go:63-64).
    *
    * `routeTable`: a parsed kvconfig route table (the reference's
    * `SetGlobalRouting` surface). When non-empty it compiles to the
    * routing column (unless an explicit `route` overrides it) AND
    * enables the [[metricJson]] alert leg for routes carrying an
    * `output:` block. */
  def start(spark: SparkSession, conf: Config, delivery: Delivery,
            route: Option[Column] = None,
            source: Option[RecordSource] = None,
            routeTable: Seq[Routing.Route] = Nil): StreamingQuery = {
    val r = route.getOrElse(
      if (routeTable.nonEmpty) Routing.column(routeTable, conf.streamName)
      else lit(conf.streamName))
    val src = source
      .getOrElse(FileLinesSource(conf.inputDir, conf.maxFilesPerTrigger))
    val transformed = transform(src.stream(spark), conf.deployEnv, r)
    // dedup AFTER transform on the EXACT serialized record (md5 of the
    // raw json, not StreamDedup's corpus-text normalization — case or
    // whitespace differences are distinct records, not replays); the
    // parsed `timestamp` is the event time. Malformed lines carry a
    // null timestamp by contract ("drop to null, never lost") — they
    // would read as epoch 0 inside the watermark operator and be
    // swallowed as late, so they bypass the dedup branch entirely.
    val out = conf.dedupWithin match {
      case Some(delay) =>
        val keyed = transformed.withColumn("content_hash", md5(col("json")))
        val deduped = keyed.filter(col("timestamp").isNotNull)
          .withColumn("event_ts", col("timestamp"))
          .withWatermark("event_ts", delay)
          .dropDuplicatesWithinWatermark("content_hash")
          .drop("event_ts")
        deduped.union(keyed.filter(col("timestamp").isNull))
      case None => transformed
    }
    // scrub LAST: routing and the replay key saw the pre-scrub record
    val delivered = if (conf.scrubPii) scrubDelivery(out) else out
    // the near-dup screen is a per-batch BATCH transform (the LSH
    // candidate join repartitions/self-joins — not streamable), applied
    // inside foreachBatch. BOTH index-side frames are derived and
    // pinned ONCE per query, not per micro-batch: the raw index (the
    // verify join's shingle sets) AND its banded-capped rows (the
    // candidate join's side — re-deriving those per trigger would
    // re-pay the bands·|index| explode plus the bucket-cap shuffle
    // over the whole historical corpus every batch). The per-batch
    // work is then only the small increment's prep plus the joins,
    // and nothing batch-sized is left pinned across triggers.
    val (screen, screenPinned): (DataFrame => DataFrame, Seq[DataFrame]) =
      conf.nearDupScreen match {
        case Some(s) =>
          val index = spark.read.parquet(s.indexDir)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val indexBands = graft.operators.Dedup.minhashIndexBands(
              index, s.bands, s.rows, s.maxBucket)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val f: DataFrame => DataFrame = batch => {
            val keyed = batch.withColumn("__nd_id", md5(col("json")))
            val hits = graft.operators.Dedup.minhashLshPairsAgainstBandedIndex(
                keyed, col("__nd_id"), col(s.column), index, indexBands,
                s.n, s.bands, s.rows, s.threshold, s.seed, s.maxBucket)
              .select(col("new_id").as("__nd_id")).distinct()
            keyed.join(hits, Seq("__nd_id"), "left_anti").drop("__nd_id")
          }
          (f, Seq(index, indexBands))
        case None => (identity[DataFrame] _, Nil)
      }
    val sink = new NdjsonBatchSink(delivery, conf.sink)
    // metric rewrite LAST: the near-dup screen keys on the PLAIN
    // record json (a replayed record must dedup whether or not its
    // route emits points), then matched records become their points.
    // The screen's pinned index frames release on termination (the
    // StreamIndex discipline — scheduled restarts must not strand one
    // cached corpus-index pair per run).
    StreamIndex.unpersistOnTermination(spark,
      delivered.writeStream
        .option("checkpointLocation", conf.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch((df: DataFrame, id: Long) =>
          sink.process(metricJson(screen(df), routeTable), id))
        .start(),
      screenPinned)
  }

  /** Convenience: forward to local NDJSON files. */
  def startToFiles(spark: SparkSession, conf: Config, outDir: String): StreamingQuery =
    start(spark, conf, new FileDelivery(outDir))
}
