package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.logs.LogColumns

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
}
