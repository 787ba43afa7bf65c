package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL facade (SURVEY.md §2.B20): registers the test tables as temp
  * views and runs plain SQL through Spark's parser/Catalyst — the
  * engine's `spark.sql` surface, so a reference user can bring raw SQL
  * instead of the DataFrame API.
  */
object GraftSql {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotently register all tables of a scale-factor dir as temp
    * views named after the tables. `events` goes through the typed
    * accessor so SQL sees the engine's canonical epoch-ns long `ts`
    * regardless of the parquet file's physical timestamp layout. */
  def register(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    TableNames.foreach { n =>
      val df = if (n == "events") t.events else t.table(n)
      df.createOrReplaceTempView(n)
    }
  }

  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }
}
