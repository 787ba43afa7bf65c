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

  /** Per-group centroid components (SURVEY.md §2.C20): mean embedding
    * per group as `(grp, pos, centroid, n)` rows — class prototypes for
    * a training pipeline, or the update step of an IVF/k-means coarse
    * quantizer. Shaped as one posexplode + one combiner-friendly
    * groupBy on (grp, pos): dim·n rows shuffle as partial sums, never
    * whole vectors.
    *
    * The accumulation is FIXED-POINT: each element widens
    * float→double (exact), scales by 1e9, and truncates toward zero
    * to a long; the integer sum is exact in any order, then one
    * division recovers the mean. Float sums are order-dependent and
    * Spark's partial-aggregation order is not deterministic across
    * partitionings, so a double `avg` would not be reproducible
    * run-to-run — and a decimal CAST is not reproducible
    * engine-to-engine (Spark rounds HALF_UP, and a near-tie element
    * was observed to round differently in DuckDB). Truncation has no
    * tie to disagree on. The 1e-9 quantization is at float32-ulp
    * scale for unit-normalized embeddings.
    */
  def groupCentroids(df: org.apache.spark.sql.DataFrame, group: Column,
                     vec: Column): org.apache.spark.sql.DataFrame =
    df.select(group.as("grp"), posexplode(vec).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      // ANSI double→long cast truncates toward zero (DuckDB: trunc)
      .agg(
        ((sum((col("x").cast("double") * lit(1e9)).cast("long")).cast("double")
          / lit(1e9)) / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("pos").cast("long").as("pos"),
        col("centroid"), col("n"))

  /** Hash-sign random projection (SURVEY.md §2.C74; Achlioptas 2001 /
    * the Johnson-Lindenstrauss lemma with a ±1 projection matrix):
    * reduce a d-dim embedding to k dims via `y_j = Σ_i sign(j,i)·x_i`,
    * where `sign(j,i) = ±1` comes from the FNV hash of `(seed, j, i)`
    * — the projection MATRIX is a pure function of the seed, so no
    * matrix ships anywhere, every executor and every engine derives
    * the identical matrix locally, and appending rows or re-running
    * on any cluster layout projects identically. The JL guarantee:
    * pairwise distances are preserved within (1±ε) for
    * k = O(ln n / ε²), making the k-dim table the cheap FIRST PASS
    * for near-dup blocking or index builds over 100 TB of embeddings
    * (scan cost drops d/k before any exact work).
    *
    * Fixed-point discipline (the [[groupCentroids]] recipe): each
    * element widens float→double (exact), scales 1e9 and truncates
    * toward zero ONCE; the ±sums are then exact integers in any
    * order. Returns `array<long>` of the k fixed-point projections
    * (divide by 1e9 to read as doubles). A pure codegen map stage:
    * the corpus is scanned once, nothing shuffles.
    */
  def randomProjectFixed(vec: Column, k: Int, seed: String): Column = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256], got $k")
    val vi = transform(vec.cast("array<double>"),
      (x, i) => struct((x * lit(1e9)).cast("long").as("x"), i.as("i")))
    graft.functions.Cols.let(vi) { arr =>
      array((0 until k).map { j =>
        aggregate(arr, lit(0L), (acc, e) =>
          acc + when(pmod(call_function("fnv1a64",
              concat(lit(s"rp:$seed:$j:"), e("i").cast("string"))),
              lit(2L)) === 1L, e("x")).otherwise(-e("x")))
      }: _*)
    }
  }

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
