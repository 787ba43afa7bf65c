package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-resilient aggregation (SURVEY.md §2.B19 / §5).
  *
  * A plain `groupBy(key)` on a low-cardinality or hot-key column puts
  * one key's entire volume on one reducer. Salting splits every key
  * into `buckets` sub-keys for the first (map-heavy) aggregation, then
  * reduces the tiny salted partials in a second stage — the classic
  * two-phase pattern, expressed declaratively so both stages get
  * map-side partial aggregation from Catalyst.
  *
  * The salt is derived from a deterministic high-cardinality column
  * (not rand()) so results are replayable and the oracle can verify
  * the final aggregate equals the unsalted one.
  */
object Skew {
  private val D = DecimalType(18, 4)

  /** count + decimal-exact sum per key, computed via `buckets`-way
    * salting. `saltFrom` must be high-cardinality (e.g. a row id). */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltFrom: Column,
                buckets: Int = 32): DataFrame = {
    val salted = df.groupBy(key.as("key"), pmod(xxhash64(saltFrom), lit(buckets)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(value.cast(D)).as("psum"))
    salted.groupBy(col("key"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("sum_value"))
  }
}
