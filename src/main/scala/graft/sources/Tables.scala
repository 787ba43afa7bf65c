package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table catalog over a scale-factor directory (SURVEY.md §D2/D3).
  *
  * All graft queries read through here so scans stay declarative:
  * Catalyst prunes columns (ReadSchema) and pushes filters
  * (PushedFilters) into the parquet scan. At cluster scale the same
  * call reads a partitioned table directory; nothing here assumes a
  * single file.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // events.parquet has shipped with two physical layouts for `ts`:
  // TIMESTAMP(NANOS) (readable by Spark only as a raw ns long) and
  // TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Graft's canonical event
  // time is `ts div 1000` (epoch µs) over an epoch-ns LONG — it matches
  // DuckDB's `epoch_us(ts)` exactly on BOTH layouts (ns→µs by integer
  // truncation; µs is exact) — so `events` normalizes the timestamp
  // layout to epoch-ns long here and every consumer sees one type.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  private def canonicalEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // ns-as-long layout
      case _ =>
        // TIMESTAMP_NTZ/TIMESTAMP µs layout: session tz is pinned UTC
        // (GraftSession), so the NTZ→instant cast is the identity wall
        // clock DuckDB uses and unix_micros is exact integer µs.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
    }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = canonicalEventTs(table("events"))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
