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

  /** Streaming entry: raw text lines → parse → windowed counts into an
    * in-memory table (swap the sink format for kafka/parquet in prod). */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
            deployEnv: String, queryName: String): StreamingQuery = {
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
}
