package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming index maintenance — the INGEST path of the pay-once ANN
  * index (SURVEY.md §2.C154, streaming side): embeddings arrive
  * continuously (a crawler's encoder output, an ingestion pipeline's
  * embedding stage), and the binary-quantized codes table must grow
  * with them WITHOUT retraining or re-encoding the existing corpus.
  */
object StreamIndex {

  /** Tail a directory of embedding parquet files and append each
    * micro-batch's 1-bit codes to a partitioned codes table.
    *
    * Contract stack (each leg proven elsewhere, composed here):
    *  - Encoding runs against the FROZEN stats table at `statsDir` —
    *    `bqEncode` under frozen stats IS the append path (the BQ
    *    append-parity law: re-encoding existing rows reproduces their
    *    codes byte-for-byte, and a grown table under a full shortlist
    *    equals bruteTopK over the union).
    *  - Each micro-batch OVERWRITES its own `batch=<id>` partition of
    *    `codesDir` (the monitor plumbing's replay-idempotence
    *    pattern): a replayed batch — rename-failure retry, or a crash
    *    between the write and the commit log — replaces its own
    *    output instead of duplicating codes.
    *  - Readers take `spark.read.parquet(codesDir)` as the
    *    `(vec_id, codes)` table of `bqTopKAgainstIndex`; the
    *    discovered `batch` partition column is dropped by selection.
    *
    * Scale shape: per batch, one codegen map pass over the new rows
    * against a bounded 1-row stats broadcast; only ⌈d/32⌉ packed
    * longs per vector land on disk — the stream writes 32× fewer
    * bytes than the raw float32 vectors it consumes, and nothing
    * corpus-sized is ever read back. Drift discipline: frozen
    * thresholds slowly stale as the embedding distribution moves —
    * monitor with C152's PSI over a code-bit or score distribution
    * and retrain+re-encode as a batch job when it alarms (the
    * standard production split: cheap streaming appends, rare
    * deliberate rebuilds). */
  def startBqIndexAppend(spark: SparkSession, inputDir: String,
                         schema: StructType, id: String, vec: String,
                         checkpointDir: String, statsDir: String,
                         codesDir: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stats = batch.sparkSession.read.parquet(statsDir)
        graft.operators.Similarity.bqEncode(batch, col(id), col(vec), stats)
          .write.mode("overwrite")
          .parquet(codesDir.stripSuffix("/") + s"/batch=$batchId")
      }
      .start()
  }
}
