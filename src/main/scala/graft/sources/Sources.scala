package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source readers beyond parquet (SURVEY.md §D2): format chosen
  * by extension, schema pushdown-preserving. All formats land in the
  * same declarative scan path, so column pruning and (for parquet)
  * predicate pushdown come from Catalyst for free.
  */
object Sources {

  /** Read a table file/directory by extension: .parquet/.csv/.jsonl
    * (one JSON object per line — the NDJSON the graft sink itself
    * writes, making sink output round-trippable as a source). */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val base = path.toLowerCase match {
      case p if p.endsWith(".csv") =>
        val r = spark.read.option("header", "true")
        schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
      case p if p.endsWith(".jsonl") || p.endsWith(".ndjson") || p.endsWith(".json") =>
        val r = spark.read
        schema.map(r.schema).getOrElse(r).json(path)
      case _ =>
        spark.read.parquet(path)
    }
    base
  }

  /** Read a whole NDJSON delivery-stream directory written by
    * FileDelivery (part-*.ndjson). */
  def readStreamOutput(spark: SparkSession, dir: String,
                       schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(s"$dir/*.ndjson")
  }
}
