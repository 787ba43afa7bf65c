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

  /** Per-dimension z-score standardization of an embedding column
    * (SURVEY.md §2.C136) — the preprocessing step before any
    * scale-sensitive vector op (k-means cells, PCA, euclidean ANN):
    * without it one wide dimension dominates every distance. Two
    * frames come back: `stats` — (pos, n, mean, std) per dimension —
    * and the corpus rebuilt as `(vec_id, zvec)` with
    * `z = (x − mean)/std` rounded once to 6 places (std = 0 ⇒ z = 0:
    * a constant dimension carries no information and must not divide
    * by zero). Rows with NULL vectors drop (posexplode contract —
    * same as every sibling vector op).
    *
    * Exactness: per-dim moment sums are once-truncated 1e9
    * fixed-point longs (the [[groupCentroids]] recipe, extended with
    * the x² sum), so mean and the clamped population variance are ONE
    * pinned IEEE tree over exact integers in any engine and any
    * partitioning. Scale shape: one posexplode → dim-keyed moment agg
    * (map-side combined, ≤dim rows out) → broadcast back into a
    * second map-side pass. The exploded `(vec_id, pos, z)` frame is
    * the PRIMARY output — at 100 TB the thin rows fuse straight into
    * the next map stage (no shuffle at all: the stats broadcast and
    * the z-map is codegen over the scan); [[standardize]] re-packs it
    * into `(vec_id, zvec)` for consumers that want arrays back, which
    * costs one dim·n-row shuffle. */
  def standardizeExploded(df: org.apache.spark.sql.DataFrame, id: Column,
                          vec: Column): org.apache.spark.sql.DataFrame = {
    val u = df.select(id.as("vec_id"),
        posexplode(vec.cast("array<double>")).as(Seq("pos", "x")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ANSI double→long cast truncates toward zero (DuckDB: trunc)
    val mu = (col("s1").cast("double") / lit(1e9)) / col("n")
    val stats = u.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum((col("x") * lit(1e9)).cast("long")).as("s1"),
        sum((col("x") * col("x") * lit(1e9)).cast("long")).as("s2"))
      .select(col("pos"), mu.as("mean"),
        sqrt(greatest(
          col("s2").cast("double") / lit(1e9) / col("n") - mu * mu,
          lit(0.0))).as("sd"))
    u.join(broadcast(stats), "pos")
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        when(col("sd") === 0.0, lit(0.0))
          .otherwise(round((col("x") - col("mean")) / col("sd"), 6)).as("z"))
  }

  /** Convenience wrapper over [[standardizeExploded]]: re-pack the
    * thin `(vec_id, pos, z)` rows into `(vec_id, zvec)` arrays. */
  def standardize(df: org.apache.spark.sql.DataFrame, id: Column,
                  vec: Column): org.apache.spark.sql.DataFrame =
    standardizeExploded(df, id, vec)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("z")))),
        s => s.getField("z")).as("zvec"))

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

  /** Top principal component via deterministic power iteration
    * (SURVEY.md §2.C75) — the PCA direction every embedding-space
    * audit wants first (dominant variance axis; its eigenvalue vs the
    * trace says how anisotropic the space is, the known failure smell
    * of collapsed embedding models). Returns one row per dimension:
    * `(pos, loading, eigenvalue)`.
    *
    * Determinism architecture: the DISTRIBUTED part is only the
    * moment accumulation — per-element fixed-point (widen → ×1e6 →
    * trunc, the [[groupCentroids]] recipe), so Σxᵢ and Σxᵢxⱼ are
    * EXACT integers (decimal-summed — immune to long overflow at
    * 10¹² rows) in any partitioning. The d×d covariance assembly and
    * the power iteration run DRIVER-SIDE on those exact moments
    * (d²·iters flops on ~4096 doubles — a scalar fetch plus
    * microseconds, the CC-convergence idiom), with every fold
    * ascending and every expression tree pinned, so the loadings are
    * bit-identical on any cluster and any engine that replays the
    * same arithmetic — which the DuckDB oracle does, term for term,
    * through all `iters` rounds. From the fixed all-ones start the
    * iteration (hence the SIGN of the component) is fully
    * deterministic; no sign convention needed.
    *
    * Scale shape: ONE corpus scan emitting d(d+1)/2 upper-triangle
    * terms per row into a map-side-combining (i, j) aggregation —
    * fine to d of a few hundred (4096 cells at d=64); past that,
    * block-accumulate or subsample the moment pass. `iters` trades
    * convergence for nothing at runtime (driver-side): 40 is plenty
    * for a spectral gap ≥ 5%.
    */
  def topComponent(df: org.apache.spark.sql.DataFrame, vec: Column,
                   dim: Int, iters: Int = 40): org.apache.spark.sql.DataFrame = {
    require(dim >= 2 && dim <= 512, s"dim must be in [2, 512], got $dim")
    require(iters >= 1 && iters <= 200, s"iters must be in [1, 200], got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val DEC = org.apache.spark.sql.types.DecimalType(38, 0)
    val xf = transform(vec.cast("array<double>"), x => (x * lit(1e6)).cast("long"))
    val base = df.filter(vec.isNotNull).select(xf.as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count().toDouble
      if (n == 0) return Seq.empty[(Long, Double, Double)]
        .toDF("pos", "loading", "eigenvalue")
      val m1 = base.select(posexplode(col("v")).as(Seq("i", "xi")))
        .groupBy(col("i")).agg(sum(col("xi").cast(DEC)).as("s1"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
      val m2 = base.select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
        .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
        .filter(col("j") >= col("i"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("xi").cast(DEC) * col("xj").cast(DEC)).as("s2"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).doubleValue())
      val c = Array.ofDim[Double](dim, dim)
      m2.foreach { case ((i, j), s2) =>
        // pinned tree: ((s2 − s1ᵢ·s1ⱼ/n)/n)/1e12 — the oracle replays it
        val cv = ((s2 - m1(i) * m1(j) / n) / n) / 1e12
        c(i)(j) = cv; c(j)(i) = cv
      }
      var v = Array.fill(dim)(1.0)
      var lam = 0.0
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dim) { i =>
          var acc = 0.0
          var j = 0
          while (j < dim) { acc = acc + c(i)(j) * v(j); j += 1 }
          acc
        }
        var acc = 0.0
        var i = 0
        while (i < dim) { acc = acc + w(i) * w(i); i += 1 }
        lam = math.sqrt(acc)
        v = w.map(_ / lam)
      }
      v.zipWithIndex.map { case (x, i) => (i.toLong, x, lam) }.toSeq
        .toDF("pos", "loading", "eigenvalue")
    } finally base.unpersist()
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
