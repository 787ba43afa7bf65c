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
  // events.parquet carries TIMESTAMP(NANOS) which Spark only reads as a
  // raw long; graft's canonical event time is `ts div 1000` (epoch µs),
  // which matches DuckDB's truncating ns→µs parquet read exactly.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
