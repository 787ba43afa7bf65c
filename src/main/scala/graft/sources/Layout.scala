package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed/sorted table layout (SURVEY.md §5/§7): pre-shuffle a table
  * ONCE into hash buckets on its join key so every later equi-join or
  * aggregation on that key is exchange-free.
  *
  * At 100 TB this is the difference between re-shuffling a fact table
  * per query and amortizing one shuffle into the storage layout: a scan
  * of a bucketed table reports `HashPartitioning(key, n)` as its output
  * partitioning, so EnsureRequirements inserts NO Exchange when two
  * tables bucketed with the same bucket count join on their bucket
  * keys (LayoutSpec asserts the exchange-free plan). Per-bucket
  * `sortBy` additionally lets sort-merge joins skip the sort when files
  * per bucket stay at one.
  */
object Layout {

  /** Drop `table` and delete its default managed location. With the
    * in-memory catalog a previous process can leave the location behind
    * with no catalog entry, and table creation then refuses with
    * LOCATION_ALREADY_EXISTS — call this before (re)creating a managed
    * table whose name may have been used before. */
  def reclaimManagedTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` as a hash-bucketed (and per-bucket sorted) parquet
    * table in the session catalog. `buckets` is a layout-time choice:
    * size it so one bucket of the LARGEST co-bucketed table fits an
    * executor core's working set (at cluster scale: hundreds to
    * thousands), and keep it identical across tables meant to join. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    reclaimManagedTable(spark, table)
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
