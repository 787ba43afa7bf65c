package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: the Spark implementation plus (where ANSI-SQL can
  * express it) a DuckDB oracle over the same parquet tables. Output
  * column names MUST match between `fn` and `oracle` — the driver's
  * compare sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Shared oracle-parity helpers (see SURVEY.md §6). */
  object sqlutil {
    /** DuckDB side of decimal-exact double aggregation. */
    def dsum(expr: String): String =
      s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"
  }
}
