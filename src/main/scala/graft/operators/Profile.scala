package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (SURVEY.md §2.D8) — the data-quality gate of a
  * curation pipeline: per-column row / non-null / exact-distinct
  * counts, computed in ONE aggregation pass over the table (Catalyst
  * plans the multi-countDistinct via Expand, so the table is scanned
  * once) and unpivoted to a row per column.
  *
  * At 100 TB swap `countDistinct` for `approx_count_distinct`: the
  * Expand multiplies the shuffled data by the distinct-column count,
  * and an exact global distinct per column is rarely worth that —
  * the HLL sketch is one pass with constant state. The exact variant
  * is what the oracle can verify, so it is what ships here.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    // names are spliced into a stack() expression — reject anything
    // that isn't a plain identifier rather than mis-parse it
    columns.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile: column name '$c' is not a plain identifier"))
    require(columns.nonEmpty, "profile: need at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      columns.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
    val stacked = columns
      .map(c => s"'$c', n_rows, nn_$c, nd_$c")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${columns.size}, $stacked) AS " +
        "(column_name, n_rows, n_nonnull, n_distinct)"))
  }

  private val EventCols = Seq("event_id", "user_id", "event_type", "value", "props")

  val qProfile = Q(
    "qprofile_table",
    (s, dir) => {
      Profile.profile(Tables(s, dir).events, EventCols)
        .orderBy(col("column_name"))
    },
    Some {
      val selects = EventCols.map(c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS n_distinct
         FROM events""")
      selects.mkString("", "\n      UNION ALL\n      ",
        "\n      ORDER BY column_name")
    })

  val all: Seq[Q] = Seq(qProfile)
}
