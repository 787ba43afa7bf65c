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

  /** Skew-resilient equi-join (SURVEY.md §2.B21): the probe side's hot
    * keys are split across `salts` sub-keys (deterministic salt from a
    * high-cardinality probe column), and the build side is replicated
    * once per salt — so one hot key's volume spreads over `salts`
    * reducers instead of one. Build-side cost is |build|·salts rows:
    * right for a moderate build side too big to broadcast but far
    * smaller than the probe; for tiny build sides prefer `broadcast()`
    * (no shuffle at all), and for ad-hoc skew AQE's skew-join split.
    * Salting is value-transparent: the join result is row-for-row the
    * plain join. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltFrom: Column, salts: Int = 16): DataFrame = {
    // salts=0 would build sequence(0,-1) on the build side and pmod-by-
    // zero (an ANSI runtime error) on the probe side; fail at call time
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val p = probe.withColumn("_salt", pmod(xxhash64(probeSaltFrom), lit(salts)))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
