package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The consumer seam (SURVEY.md §2.A9/A13): where the reference plugs a
  * Kinesis Client Library batch consumer into its sender
  * (/root/reference/main.go:63-64, `kbc.NewBatchConsumer(config, sender)`),
  * graft plugs a `RecordSource` into [[Forwarder.start]]. Swapping in a
  * real connector (Kinesis, Kafka, socket, …) means providing an
  * implementation — not editing the pipeline.
  */
trait RecordSource extends Serializable {

  /** A STREAMING DataFrame with one STRING column `value` — one raw
    * record payload per row. Rate limiting and offset tracking are the
    * implementation's concern; the pipeline adds checkpointing
    * (`checkpointLocation`) and delivery semantics downstream. */
  def stream(spark: SparkSession): DataFrame
}

/** Directory-of-text-files source — the zero-egress stand-in for a
  * Kinesis shard iterator. `maxFilesPerTrigger` caps records ingested
  * per micro-batch (the reference's per-shard read rate limit,
  * main.go:52); Spark's file-source offset log provides the
  * resume-without-reprocess semantics of the KCL lease table. */
final case class FileLinesSource(dir: String, maxFilesPerTrigger: Int = 10)
    extends RecordSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
}
