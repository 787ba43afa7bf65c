package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.logs.LogColumns
import graft.sinks.{Delivery, NdjsonBatchSink, SinkConfig}

/** The reference's drop-stats aggregation (SURVEY.md §2.A11):
  * per-minute tumbling counts of records grouped by container_app and
  * level, with `_UNKNOWN_`/`debug` defaults
  * (/root/reference/sender/stats/stats.go:18-58) — as a watermarked
  * streaming aggregation with bounded state.
  */
object DropStats {

  /** Shared transform: parsed lines → 1-minute tumbling window counts.
    * The 2-minute watermark bounds aggregation state at scale; late
    * records beyond it are dropped, mirroring the reference's
    * fire-and-reset minute ticker. */
  def aggregate(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("timestamp", "2 minutes")
      .groupBy(
        window(col("timestamp"), "1 minute"),
        col("container_app").as("app"),
        col("level"))
      .agg(count(lit(1)).as("n_dropped"))
      .select(col("window.start").as("minute"), col("app"), col("level"), col("n_dropped"))

  /** The reference's per-minute summary RECORD shape
    * (/root/reference/sender/stats/stats.go:31-38): one row per minute
    * with `total_dropped`, `app_count`, an apps→count map and a
    * levels→count map — computed FROM [[aggregate]]'s per-(minute, app,
    * level) rows (which stay the granular, oracle-checked form; this is
    * the emission shape an operator of the reference expects). Map
    * entries are sorted by key so the record is deterministic. Use under
    * `foreachBatch` in streaming, or directly on the batch equivalent. */
  def summary(perAppLevel: DataFrame): DataFrame = {
    val totals = perAppLevel.groupBy(col("minute"))
      .agg(sum(col("n_dropped")).as("total_dropped"))
    val apps = perAppLevel.groupBy(col("minute"), col("app"))
      .agg(sum(col("n_dropped")).as("n"))
      .groupBy(col("minute"))
      .agg(
        count(lit(1)).as("app_count"),
        map_from_entries(array_sort(collect_list(struct(col("app"), col("n"))))).as("apps"))
    val levels = perAppLevel.groupBy(col("minute"), col("level"))
      .agg(sum(col("n_dropped")).as("n"))
      .groupBy(col("minute"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("level"), col("n"))))).as("level"))
    totals.join(apps, "minute").join(levels, "minute")
      .select(col("minute"), col("total_dropped"), col("app_count"), col("apps"), col("level"))
  }

  /** [[summary]] rows shaped as the reference's emission RECORD: the
    * stats goroutine logs the per-minute rollup under the kayvee title
    * `"drop-stats"` (/root/reference/sender/stats/stats.go:31-38,
    * `log.TraceD("drop-stats", tmp)`), which is exactly the field the
    * shipped kvconfig matches on (/root/reference/kvconfig.yml:4). */
  def emissionRecords(summaryRows: DataFrame): DataFrame =
    summaryRows.select(lit("drop-stats").as("title"), col("minute"),
      col("total_dropped"), col("app_count"), col("apps"), col("level"))

  /** Route [[emissionRecords]] by a kvconfig route table and attach the
    * matched route's `output:` alert metadata — `series`, `dimensions`,
    * `stat_type`, and `value` read from the record's `value_field`
    * column (/root/reference/kvconfig.yml:5-10). Records whose route
    * carries no output block get null metadata; unmatched records go to
    * `default`. Wiring-wise this is the reference's `SetGlobalRouting`
    * (/root/reference/main.go:42) applied to the stats emission. */
  def routedSummary(summaryRows: DataFrame, routes: Seq[Routing.Route],
                    default: String = "main"): DataFrame = {
    val withOut = routes.filter(_.output.isDefined)
    def meta(nullType: String)(f: Routing.Output => Column): Column =
      withOut.foldRight(lit(null).cast(nullType)) { (r, acc) =>
        when(col("stream") === r.name, f(r.output.get)).otherwise(acc)
      }
    val em = emissionRecords(summaryRows)
    // schema-aware compile: the summary shape's `level` is a MAP and
    // most log fields are absent — matchers on those must fall through
    // to default, not crash the stream at analysis. The same rule holds
    // for output metadata: a shared kvconfig route whose value_field is
    // empty or names a field this frame lacks yields a null value, not
    // an analysis failure at stream start.
    val fields = em.schema.fieldNames.toSet
    def valueOf(o: Routing.Output): Column =
      if (o.valueField.nonEmpty && fields(o.valueField)) col(o.valueField).cast("double")
      else lit(null).cast("double")
    def dimsOf(o: Routing.Output): Column =
      if (o.dimensions.isEmpty) lit(Array.empty[String])
      else array(o.dimensions.map(lit): _*)
    em.withColumn("stream", Routing.columnFor(em, routes, default))
      .withColumn("series", meta("string")(o => lit(o.series)))
      .withColumn("dimensions", meta("array<string>")(dimsOf))
      .withColumn("stat_type", meta("string")(o => lit(o.statType)))
      .withColumn("value", meta("double")(valueOf))
  }

  /** Deliver routed summary records through the batched sink — the full
    * A11 (drop-stats) → A12 (kvconfig routing) → A6 (batched delivery)
    * wiring of the reference's alerting path. */
  def deliverSummary(summaryRows: DataFrame, routes: Seq[Routing.Route],
                     delivery: Delivery, conf: SinkConfig = SinkConfig(),
                     default: String = "main", batchId: Long = 0L): Unit = {
    val routed = routedSummary(summaryRows, routes, default)
    val out = routed.withColumn("json", to_json(struct(
      col("title"), col("minute"), col("total_dropped"), col("app_count"),
      col("apps"), col("level"), col("series"), col("dimensions"),
      col("stat_type"), col("value"))))
    new NdjsonBatchSink(delivery, conf).process(out, batchId)
  }

  /** Streaming entry: raw text lines → parse → windowed counts into an
    * in-memory table (swap the sink format for kafka/parquet in prod). */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
            deployEnv: String, queryName: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val lines = spark.readStream.text(inputDir)
    val parsed = LogColumns.enhance(lines, col("value"), deployEnv)
    aggregate(parsed).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Streaming emission of the reference-shaped [[summary]] records:
    * the watermarked per-(minute, app, level) aggregation emits
    * FINALIZED minutes (append mode), and `foreachBatch` rolls each
    * batch of finalized rows up into one summary record per minute —
    * the streaming analogue of the reference's fire-and-reset minute
    * ticker (stats.go:24-43). Records append to a managed table named
    * `queryName` (swap for a kafka/alerts sink in prod). */
  def startSummary(spark: SparkSession, inputDir: String, checkpointDir: String,
                   deployEnv: String, queryName: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    graft.sources.Layout.reclaimManagedTable(spark, queryName)
    val lines = spark.readStream.text(inputDir)
    val parsed = LogColumns.enhance(lines, col("value"), deployEnv)
    aggregate(parsed).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary(batch).write.mode("append").saveAsTable(queryName)
      }
      .start()
  }

  /** Streaming emission of [[summary]] records ROUTED by a kvconfig
    * table to a batched delivery — the complete analogue of the
    * reference process: the stats ticker's per-minute record
    * (stats.go:24-43) flows through `SetGlobalRouting`'s route table
    * (main.go:42, kvconfig.yml) into the delivery stream named by the
    * matched route, alert metadata attached from its `output:` block. */
  def startSummaryRouted(spark: SparkSession, inputDir: String,
                         checkpointDir: String, deployEnv: String,
                         routes: Seq[Routing.Route], delivery: Delivery,
                         conf: SinkConfig = SinkConfig()): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val lines = spark.readStream.text(inputDir)
    val parsed = LogColumns.enhance(lines, col("value"), deployEnv)
    aggregate(parsed).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        deliverSummary(summary(batch), routes, delivery, conf, batchId = id)
      }
      .start()
  }

  /** Rate-spike detection over bucketed per-group counts (A14) — the
    * alerting read of the drop-stats surface: for each group (app,
    * series), count events per integer time bucket, then flag buckets
    * whose count exceeds mean + k·σ of that group's own history. The
    * z-score cut is the classic ops-dashboard spike rule; the robust
    * (median/MAD) alternative for outlier-poisoned baselines is
    * [[graft.operators.Profile.robustOutliers]] — same output
    * discipline, pick by contamination expectations.
    *
    * Exactness: per-bucket counts and the (n, Σn, Σn²) moments are
    * exact longs; mean/σ/cut is ONE pinned IEEE tree over them
    * (var clamped at 0 before sqrt — FP cancellation on a constant
    * series must read σ = 0, not NaN), identical in any engine, so
    * the spike verdict transfers exactly. Scale shape: one map-side-
    * combined (group, bucket) count, one ~#groups-row moment
    * aggregate broadcast back — the event stream shuffles only as
    * (group, bucket) count pairs. */
  /** One-sided CUSUM level-shift detection over bucketed per-group
    * counts (A16; Page 1954) — the changepoint signal [[rateSpikes]]'
    * z-cut can't give: a spike rule flags single outlier buckets,
    * CUSUM accumulates SMALL persistent drifts (a route leaking 10%
    * more errors every bucket) until the cumulated excess crosses a
    * threshold. Update: `s_i = max(0, s_{i-1} + n_i − ref − slack)`,
    * flagged when `s_i ≥ threshold`; `ref` is the group's own mean
    * bucket count (integer-truncated), `slack` absorbs noise drift
    * (Page's k), `threshold` is the decision interval (Page's h). The
    * downward twin is the same call on a negated series — compose,
    * don't parameterize.
    *
    * The recurrence is NOT computed as a sequential fold: the closed
    * form `s_i = P_i − min(0, min_{j≤i} P_j)` (P = running sum of
    * the slack-adjusted deviations) turns it into two stacked RUNNING
    * window frames over the same (group, bucket) sort — one shuffle,
    * one sort, no per-row recursion anywhere. All-integer arithmetic,
    * so the flag boundary is exact in any engine.
    *
    * Scale shape: the event stream collapses map-side to (group,
    * bucket) counts; the ~#groups-row reference frame broadcasts
    * back; the running windows partition BY GROUP and hold one long
    * of state per row — rows per partition are bounded by the
    * monitored time range over the bucket width, not the corpus. */
  def cusumShift(df: DataFrame, group: Column, bucket: Column,
                 slack: Long = 1L, threshold: Long = 15L): DataFrame =
    cusumOverCounts(
      df.select(group.as("grp"), bucket.cast("long").as("bucket"))
        .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n")),
      slack, threshold)

  /** [[cusumShift]] over an already-counted `(grp, bucket, n)` frame —
    * the form the STREAMING monitor recomputes per micro-batch from
    * its accumulated partial-count table (counts add across batches;
    * raw lines never persist). */
  def cusumOverCounts(counts: DataFrame,
                      slack: Long, threshold: Long): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold >= 1, s"threshold must be positive, got $threshold")
    val ref = counts.groupBy(col("grp"))
      .agg(expr("sum(n) div count(1)").as("ref"))
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.join(broadcast(ref), "grp")
      .select(col("grp"), col("bucket"), col("n"), col("ref"),
        sum(col("n") - col("ref") - lit(slack)).over(w).as("p"))
      .select(col("grp"), col("bucket"), col("n"), col("ref"), col("p"),
        min(col("p")).over(w).as("mp"))
      .select(col("grp"), col("bucket"), col("n"), col("ref"),
        (col("p") - least(col("mp"), lit(0L))).as("cusum"))
      .withColumn("shifted", col("cusum") >= lit(threshold))
  }

  /** Streaming CUSUM drift monitor (A16 streaming): tail the log
    * stream, maintain a PARTIAL-COUNT table — each micro-batch appends
    * its own (app, bucket) counts, so a bucket spanning batches sums
    * correctly on read and raw lines are never retained — and after
    * every batch recompute the full CUSUM frame into `alarmsDir`.
    * The recompute is STAGED: it writes to a side directory first,
    * then deletes the old verdicts and renames the staging dir into
    * place — a reader can no longer observe a half-written recompute
    * (Spark's own overwrite is delete-then-write for the whole job);
    * what remains is the two-metadata-op delete→rename gap, in which
    * a reader sees a missing dir, never a partial one. Exactly the
    * batch operator re-run on growing state, so the monitor's output
    * after N files ≡ [[cusumShift]] over those N files' lines (the
    * C18 batch-twin discipline, spec-pinned).
    *
    * Scale shape: per batch, lines collapse map-side to (app, bucket)
    * counts before anything persists; the recompute reads only the
    * count table (time-range-bounded, not corpus-bounded). Compact
    * `countsDir` periodically (Layout.compact) if bucket cardinality
    * makes the per-batch file count matter. */
  def startCusumMonitor(spark: SparkSession, inputDir: String,
                        checkpointDir: String, countsDir: String,
                        alarmsDir: String, deployEnv: String,
                        bucketSeconds: Long = 60L,
                        slack: Long = 1L, threshold: Long = 15L): StreamingQuery =
    startCountMonitor(spark, inputDir, checkpointDir, countsDir, alarmsDir,
      deployEnv, bucketSeconds)(cusumOverCounts(_, slack, threshold))

  /** Streaming twin of [[rateSpikes]] (A14 streaming): the same
    * tail→partial-count-table→recompute plumbing as
    * [[startCusumMonitor]], recomputing the global-moment z-cut per
    * micro-batch. Output after N files ≡ `rateSpikes` over those N
    * files' lines (spec-pinned, incl. checkpoint resume). */
  def startSpikeMonitor(spark: SparkSession, inputDir: String,
                        checkpointDir: String, countsDir: String,
                        alarmsDir: String, deployEnv: String,
                        bucketSeconds: Long = 60L,
                        k: Double = 2.0): StreamingQuery =
    startCountMonitor(spark, inputDir, checkpointDir, countsDir, alarmsDir,
      deployEnv, bucketSeconds)(rateSpikesOverCounts(_, k))

  /** Streaming twin of [[seasonalResiduals]] (A17 streaming): per
    * micro-batch, re-derive every bucket's seasonal residual against
    * the bucket one season back in the accumulated count table and
    * z-cut the residual distribution. `lag` is in buckets (e.g. 1440
    * one-minute buckets = 1 day). Output after N files ≡
    * `seasonalResiduals` over those N files' lines (spec-pinned). */
  def startSeasonalMonitor(spark: SparkSession, inputDir: String,
                           checkpointDir: String, countsDir: String,
                           alarmsDir: String, deployEnv: String,
                           lag: Long, bucketSeconds: Long = 60L,
                           k: Double = 3.0): StreamingQuery =
    startCountMonitor(spark, inputDir, checkpointDir, countsDir, alarmsDir,
      deployEnv, bucketSeconds)(seasonalResidualsOverCounts(_, lag, k))

  /** The per-line (grp, bucket) projection the PSI drift monitor
    * persists: app × power-of-two LINE-LENGTH bucket (C152's
    * `length(bin(x)) − 1` integer recipe over the raw line). Line
    * length is the cheapest per-line distribution with real failure
    * modes behind it — a format change, a runaway stack-trace app, a
    * payload-shape migration all move it — and unlike the rate
    * detectors it needs NO parseable timestamp: unparseable garbage
    * lines still have a length, and their drift is exactly what the
    * monitor should see (they land in `_UNKNOWN_`'s group). ONE
    * definition shared by the monitor and its batch twin. */
  private[graft] def psiLineBuckets(lines: DataFrame, deployEnv: String): DataFrame =
    LogColumns.enhance(lines, col("value"), deployEnv)
      .select(col("container_app").as("grp"),
        (length(bin(greatest(length(col("rawlog")).cast("long"), lit(1L)))) - 1)
          .cast("long").as("bucket"))

  /** Batch side of the PSI monitor's twin law — the accumulated
    * `(grp, bucket, n)` count frame over a batch of raw lines; also
    * how a REFERENCE window becomes the pinned counts table
    * [[startPsiMonitor]] compares against (run it over a healthy
    * window, write the result to `refCountsDir`). */
  def psiIngestCounts(lines: DataFrame, deployEnv: String): DataFrame =
    psiLineBuckets(lines, deployEnv)
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n"))

  /** Streaming PSI drift monitor (C152 streaming; completes D14/C152's
    * drift story at INGEST): tail the log stream, maintain the
    * (app, length-bucket) partial-count table — the same raw-lines-
    * never-persist plumbing as the rate monitors, with a VALUE bucket
    * instead of a time bucket — and after every micro-batch recompute
    * each app's PSI against the pinned reference-window counts at
    * `refCountsDir` into `alarmsDir` as `(grp, n_buckets, psi)`.
    * Read the verdicts with the C152 folklore (< 0.1 stable, 0.1-0.25
    * investigate, > 0.25 moved). Output after N files ≡
    * `Profile.psiOverCounts(ref, psiIngestCounts(those N files))`
    * (spec-pinned, incl. checkpoint resume) — the smoothing/micro-nat/
    * fixed-point tree is psiByGroup's single definition, so the
    * monitor inherits the oracle-gated exactness. */
  def startPsiMonitor(spark: SparkSession, inputDir: String,
                      checkpointDir: String, countsDir: String,
                      alarmsDir: String, deployEnv: String,
                      refCountsDir: String): StreamingQuery =
    startBucketMonitor(spark, inputDir, checkpointDir, countsDir, alarmsDir)(
      psiLineBuckets(_, deployEnv)) { counts =>
      val ref = counts.sparkSession.read.parquet(refCountsDir)
        .select(col("grp").as("source"), col("bucket"), col("n"))
      graft.operators.Profile.psiOverCounts(ref,
          counts.select(col("grp").as("source"), col("bucket"), col("n")))
        .select(col("source").as("grp"), col("n_buckets"), col("psi"))
    }

  /** The shared monitor plumbing all three anomaly detectors ride:
    * tail `inputDir`, collapse each micro-batch map-side to
    * (grp, bucket) partial counts written to `countsDir/batch=<id>`
    * with overwrite semantics (raw lines never persist; a bucket
    * spanning batches sums on read; a REPLAYED batch overwrites its
    * own partition instead of double-appending), then
    * recompute the full verdict frame from the summed table and stage
    * it into `alarmsDir` (write-aside + delete/rename — a reader can
    * see a missing dir for two metadata ops, never a partial one).
    * The detector-specific math is the `recompute` function over the
    * `(grp, bucket, n)` frame — exactly the batch operator's core, so
    * the batch-twin law is a property of this plumbing, proven once
    * per detector by spec. */
  private def startCountMonitor(spark: SparkSession, inputDir: String,
                                checkpointDir: String, countsDir: String,
                                alarmsDir: String, deployEnv: String,
                                bucketSeconds: Long)
                               (recompute: DataFrame => DataFrame): StreamingQuery = {
    require(bucketSeconds >= 1, s"bucketSeconds must be positive, got $bucketSeconds")
    startBucketMonitor(spark, inputDir, checkpointDir, countsDir, alarmsDir) {
      lines =>
        LogColumns.enhance(lines, col("value"), deployEnv)
          // an unparseable timestamp has no bucket to drift in — dropping
          // beats a NULL bucket silently heading every group's series
          .filter(col("timestamp").isNotNull)
          .select(col("container_app").as("grp"),
            expr(s"unix_seconds(timestamp) div $bucketSeconds").as("bucket"))
    }(recompute)
  }

  /** The (grp, bucket)-agnostic layer under [[startCountMonitor]]:
    * `prep` maps the raw line frame to one (grp, bucket) row per line
    * — a TIME bucket for the rate detectors, a VALUE bucket for the
    * distribution-drift monitor — and everything downstream (partial-
    * count appends, full recompute, staged rename) is shared. */
  /** One-time layout migration at monitor start: the counts table
    * changed from flat appended part files to `batch=<id>` partition
    * dirs (the replay-idempotence fix). A monitor restarted over a
    * pre-existing FLAT countsDir would write `batch=N` alongside the
    * legacy root-level part files, and the next
    * `spark.read.parquet(countsDir)` would fail partition discovery
    * (conflicting directory structures) — bricking the monitor until
    * the directory is hand-migrated. Detect root-level data files once
    * at start and MOVE them into a `batch=legacy` partition: their
    * counts keep summing into every recompute (the discovered `batch`
    * column is dropped by the (grp, bucket) rollup either way), and
    * `legacy` can never collide with a numeric micro-batch id. A
    * failed rename raises loudly — a half-migrated dir must not start
    * streaming. */
  private[streaming] def migrateLegacyCounts(spark: SparkSession,
                                             countsDir: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(countsDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) {
      // metadata sidecars (_SUCCESS, .crc) are not data; ChecksumFileSystem
      // hides and co-renames the .crc sidecars itself
      val rootFiles = fs.listStatus(dir).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (rootFiles.nonEmpty) {
        val legacy = new org.apache.hadoop.fs.Path(dir, "batch=legacy")
        fs.mkdirs(legacy)
        rootFiles.foreach { st =>
          val to = new org.apache.hadoop.fs.Path(legacy, st.getPath.getName)
          if (!fs.rename(st.getPath, to))
            throw new java.io.IOException(
              s"monitor: legacy counts migration failed moving ${st.getPath} to $to")
        }
      }
    }
  }

  private def startBucketMonitor(spark: SparkSession, inputDir: String,
                                 checkpointDir: String, countsDir: String,
                                 alarmsDir: String)
                                (prep: DataFrame => DataFrame)
                                (recompute: DataFrame => DataFrame): StreamingQuery =
    startBucketMonitorOver(spark, spark.readStream.text(inputDir),
      checkpointDir, countsDir, alarmsDir)(prep)(recompute)

  /** [[startBucketMonitor]] over an arbitrary streaming SOURCE frame —
    * the text-lines default above is the log monitors' shape; the
    * index drift monitors ([[StreamIndex.startBqDriftMonitor]],
    * [[StreamIndex.startIvfDriftMonitor]]) ride the identical
    * partial-count/staged-rename plumbing over a parquet embedding
    * stream. `prep` maps a micro-batch to its (grp, bucket) rows and
    * runs INSIDE foreachBatch (batch context, not on the streaming
    * frame): all preps here are stateless so the output is identical,
    * and it lets a prep carry a batch-only operator — the IVF
    * monitor's nearest-centroid argmax is a groupBy, which streaming
    * append mode would reject as an unwatermarked aggregation. */
  private[streaming] def startBucketMonitorOver(spark: SparkSession, source: DataFrame,
                                                checkpointDir: String, countsDir: String,
                                                alarmsDir: String)
                                               (prep: DataFrame => DataFrame)
                                               (recompute: DataFrame => DataFrame): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    migrateLegacyCounts(spark, countsDir)
    source
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val batch = prep(rawBatch)
        // idempotent per-batch counts: each micro-batch OVERWRITES its
        // own batchId-named partition dir instead of appending to the
        // shared table — a replayed batch (rename-failure retry below,
        // or a restart that re-runs the last uncommitted batch) lands
        // on its own dir and replaces it, never double-appending its
        // counts into every later recompute. The read below sums the
        // whole partitioned table; the discovered `batch` column is
        // dropped by the (grp, bucket) rollup.
        batch.groupBy(col("grp"), col("bucket"))
          .agg(count(lit(1)).as("n"))
          .write.mode("overwrite")
          .parquet(countsDir.stripSuffix("/") + s"/batch=$batchId")
        // a recompute that persists its input (seasonal) leaves a cache
        // entry rooted at countsDir; writing to the batch=<id> CHILD no
        // longer auto-invalidates the parent-rooted entry the way the
        // old direct append did — refresh explicitly or a later batch
        // recomputes over stale cached counts
        batch.sparkSession.catalog.refreshByPath(countsDir)
        val counts = batch.sparkSession.read.parquet(countsDir)
          .groupBy(col("grp"), col("bucket")).agg(sum(col("n")).as("n"))
        // batchId-suffixed staging: a driver death between write and
        // rename leaves a stale dir a LATER batch would otherwise race
        // on / resurrect; unique names make stale staging inert (the
        // reaper below clears our own leftovers). alarmsDir must be
        // per-monitor and on a rename-capable filesystem (object
        // stores copy — the delete/rename window widens there).
        val stagingBase = alarmsDir.stripSuffix("/") + "__staging"
        val staging = s"${stagingBase}_$batchId"
        recompute(counts)
          .write.mode("overwrite").parquet(staging)
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        val dst = new org.apache.hadoop.fs.Path(alarmsDir)
        val fs = dst.getFileSystem(conf)
        // clear stale staging dirs from prior crashed batches of THIS
        // monitor (same base, different batchId)
        val parent = dst.getParent
        if (parent != null && fs.exists(parent)) {
          val baseName = new org.apache.hadoop.fs.Path(stagingBase).getName
          val curName = new org.apache.hadoop.fs.Path(staging).getName
          fs.listStatus(parent).foreach { st =>
            val n = st.getPath.getName
            // compare by NAME: listStatus returns qualified URIs
            // (file:/...), never string-equal to the raw path
            if (n.startsWith(baseName + "_") && n != curName)
              fs.delete(st.getPath, true)
          }
        }
        fs.delete(dst, true)
        // a silently-failed rename would leave NO verdicts at all —
        // delete our staging then fail the batch loudly so the stream
        // surfaces it and the next trigger retries the recompute
        if (!fs.rename(new org.apache.hadoop.fs.Path(staging), dst)) {
          fs.delete(new org.apache.hadoop.fs.Path(staging), true)
          throw new java.io.IOException(
            s"monitor: rename $staging -> $alarmsDir failed")
        }
        // a recompute that persists its input (seasonalResiduals
        // OverCounts) would otherwise leave one cache entry PER
        // MICRO-BATCH in a long-running monitor (each batch's counts
        // frame is a fresh plan) — the verdicts are on disk now, so
        // drop any entry keyed on this batch's counts plan; a no-op
        // when the recompute never persisted
        counts.unpersist(blocking = false): Unit
      }
      .start()
  }

  /** Seasonal-naive residual anomaly (A17) — the detector for metrics
    * with a daily/weekly shape, where A14's global z-cut flags every
    * healthy peak hour: compare each bucket to the SAME bucket one
    * season earlier (`lag` buckets back, e.g. 144 ten-minute buckets =
    * 1 day), and z-cut the RESIDUALS against the group's own residual
    * distribution. The lag lookup is a (group, bucket−lag) equi
    * self-join — never a window over the full series — so a sparse
    * series costs only its occupied buckets; first-season buckets have
    * no baseline and are emitted with a NULL verdict (honest absence,
    * not an implicit 0 baseline).
    *
    * Exactness: counts and residuals are exact longs, the residual
    * moments are exact (n, Σr, Σr²) longs, mean/σ/cut is one pinned
    * IEEE tree with the variance clamped at 0 (the A14 recipe on
    * residuals). Scale shape: one map-side-combined (group, bucket)
    * count, one equi self-join of that counts frame with itself, one
    * ~#groups-row moment broadcast back. */
  def seasonalResiduals(df: DataFrame, group: Column, bucket: Column,
                        lag: Long, k: Double = 3.0): DataFrame =
    seasonalResidualsOverCounts(
      df.select(group.as("grp"), bucket.cast("long").as("bucket"))
        .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n")),
      lag, k)

  /** [[seasonalResiduals]] over an already-counted `(grp, bucket, n)`
    * frame — the form [[startSeasonalMonitor]] recomputes per
    * micro-batch from its accumulated partial-count table. */
  def seasonalResidualsOverCounts(countsIn: DataFrame,
                                  lag: Long, k: Double = 3.0): DataFrame = {
    require(lag >= 1, s"lag must be positive, got $lag")
    // three consumers (lag self-join x2, moments) — persist, don't
    // recompute the upstream count from the scan three times
    val counts = countsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = counts.select(col("grp"),
      (col("bucket") + lit(lag)).as("bucket"), col("n").as("n_prev"))
    val resid = counts.join(prev, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"), col("n"), col("n_prev"),
        (col("n") - col("n_prev")).as("resid"))
    val moments = resid.filter(col("resid").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("nb"),
        sum(col("resid")).as("s1"), sum(col("resid") * col("resid")).as("s2"))
    val mean = col("s1").cast("double") / col("nb").cast("double")
    val sd = sqrt(greatest(
      col("s2").cast("double") / col("nb").cast("double") - mean * mean,
      lit(0.0)))
    resid.join(broadcast(moments), Seq("grp"))
      .select(col("grp"), col("bucket"), col("n"), col("n_prev"), col("resid"),
        round(mean, 6).as("mean_r"), round(sd, 6).as("sd_r"),
        when(col("resid").isNotNull,
          abs(col("resid").cast("double") - mean) > lit(k) * sd).as("anomalous"))
  }

  def rateSpikes(df: DataFrame, group: Column, bucket: Column,
                 k: Double = 2.0): DataFrame =
    rateSpikesOverCounts(
      df.select(group.as("grp"), bucket.cast("long").as("bucket"))
        .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("n")),
      k)

  /** [[rateSpikes]] over an already-counted `(grp, bucket, n)` frame —
    * the form [[startSpikeMonitor]] recomputes per micro-batch from
    * its accumulated partial-count table. */
  def rateSpikesOverCounts(counts: DataFrame, k: Double = 2.0): DataFrame = {
    val moments = counts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast("double") / col("n_buckets").cast("double")
    val variance = greatest(
      col("s2").cast("double") / col("n_buckets").cast("double") - mean * mean,
      lit(0.0))
    counts.join(broadcast(moments), "grp")
      .select(col("grp"), col("bucket"), col("n"),
        round(mean, 6).as("mean_n"),
        round(sqrt(variance), 6).as("sd_n"),
        (col("n").cast("double") > mean + lit(k) * sqrt(variance)).as("spike"))
  }
}
