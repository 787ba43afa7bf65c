package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.C13),
  * built from `zip_with`/`aggregate` higher-order functions in double
  * precision — no UDF, no serialization boundary, distributable as a
  * pure map stage.
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy (as array<double>): pre-normalizing once turns
    * every downstream cosine into a plain dot product — at scale this is
    * one map pass instead of re-deriving norms per pair. */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
