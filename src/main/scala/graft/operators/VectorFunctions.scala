package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns
  * (SURVEY.md §2.C13). The dot-product kernel is the native codegen
  * expression `graft_vec_dot` (functions/ArrayExpressions.scala) — a
  * tight loop with no intermediate allocation, ~20-50× the equivalent
  * `aggregate(zip_with(...))` HOF and bit-identical to it (same
  * left-to-right accumulation).
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_vec_dot",
      a.cast("array<double>"), b.cast("array<double>"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy (as array<double>): pre-normalizing once turns
    * every downstream cosine into a plain dot product — at scale this is
    * one map pass instead of re-deriving norms per pair. The norm is
    * let-bound: captured un-bound inside the transform lambda it would be
    * recomputed (a full dot product) per element — O(dim²) per vector. */
  def normalized(a: Column): Column =
    graft.functions.Cols.let(norm(a)) { n =>
      transform(a, x => x.cast("double") / n)
    }
}
