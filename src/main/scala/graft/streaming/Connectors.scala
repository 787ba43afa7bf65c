package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector-shaped [[RecordSource]] adapters (SURVEY.md §2.A13): the
  * config surface a real deployment points at Kafka or Kinesis, mapped
  * onto Spark's DataSource-V2 streaming reader options. This container
  * has no connector jars and no egress, so these are COMPILE-ONLY
  * adapters: `options`/`format` (the part that encodes the reference's
  * consumer semantics — where to start, how hard to pull) is real and
  * unit-tested; `stream()` wires it to `spark.readStream` and resolves
  * only when the matching connector jar is on the cluster classpath.
  *
  * The integration status is MACHINE-CHECKED, not prose:
  * ConnectorIntegrationSpec probes provider resolution at runtime —
  * in this container it asserts the failure is exactly Spark's
  * missing-provider error (and that no kafka/kinesis jar exists on
  * /opt/spark/jars), and on a deployment that carries the connector
  * it upgrades to a real produce→consume round-trip behind
  * `GRAFT_KAFKA_IT=1` + `GRAFT_KAFKA_BOOTSTRAP` (an embedded
  * localhost KRaft broker works — it is the jars this sandbox lacks,
  * not the network).
  */
object Connectors {

  /** Kafka consumer config → the spark-sql-kafka source. Mirrors the
    * role of the reference's KCL batch-consumer config
    * (/root/reference/main.go:47-53): `maxRecordsPerTrigger` is its
    * read rate limit, `startAt` its initial-position setting. */
  final case class KafkaSource(
      bootstrapServers: String,
      topic: String,
      groupId: String = "graft-forwarder",
      startAt: String = "latest", // "earliest" | "latest"
      maxRecordsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false) extends RecordSource {

    def format: String = "kafka"

    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topic,
        "kafka.group.id" -> groupId,
        "startingOffsets" -> startAt,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxRecordsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

    /** Kafka `value` is BINARY; the pipeline contract is one STRING
      * `value` column per record (UTF-8 payloads, as in the reference's
      * Kinesis records). */
    override def stream(spark: SparkSession): DataFrame =
      spark.readStream.format(format).options(options).load()
        .select(col("value").cast("string").as("value"))
  }

  /** Kinesis consumer config → the options shape shared by the public
    * Spark Kinesis connectors (spark-sql-kinesis and the AWS Glue/EMR
    * forks all accept stream name + region + initial position; the
    * format name differs per distribution, so it's a parameter). This
    * is the adapter an operator of the reference (a KCL consumer,
    * /root/reference/main.go:63-64) would reach for first. */
  final case class KinesisSource(
      streamName: String,
      region: String,
      initialPosition: String = "LATEST", // "TRIM_HORIZON" | "LATEST"
      endpointUrl: Option[String] = None,
      maxFetchRatePerShard: Option[Int] = None,
      formatName: String = "kinesis") extends RecordSource {

    def format: String = formatName

    def options: Map[String, String] =
      Map(
        "streamName" -> streamName,
        "region" -> region,
        "initialPosition" -> initialPosition) ++
        endpointUrl.map("endpointUrl" -> _) ++
        maxFetchRatePerShard.map("shardFetchRatePerSec" -> _.toString)

    /** Kinesis connector rows carry the payload as BINARY `data`. */
    override def stream(spark: SparkSession): DataFrame =
      spark.readStream.format(format).options(options).load()
        .select(col("data").cast("string").as("value"))
  }
}
