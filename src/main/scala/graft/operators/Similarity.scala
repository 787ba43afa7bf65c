package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.C6-C7).
  *
  * Scale design (§5): `bruteTopK` broadcasts the (small) query set and
  * streams the corpus — one map stage plus a shuffle keyed by query for
  * the per-query top-k; the corpus is never shuffled. `lshTopK` is the
  * scale path: random-hyperplane signatures bucket corpus and queries,
  * so each query only scores its bucket's candidates (multi-table OR
  * construction recovers recall).
  */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Ties broken by neighbor id for determinism. */
  def bruteTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                queries: DataFrame, queryId: Column, queryVec: Column,
                k: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), VectorFunctions.normalized(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), VectorFunctions.normalized(queryVec).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.dot(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed → stable
    * signatures across runs and executors). */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-bit signature of a vector against one table's hyperplanes
    * (shared with Dedup's embedding LSH candidate generation). */
  private[operators] def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = VectorFunctions.dot(vec, typedLit(p))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All (table_id, bucket) rows for a vector column: one row per LSH
    * table, bucket = that table's sign-bit signature. */
  private[operators] def bucketRows(v: DataFrame, idName: String, vecName: String,
                                    dim: Int, tables: Int, planesPerTable: Int,
                                    seed: Long): DataFrame =
    v.select(col(idName), posexplode(array(
      (0 until tables).map { t =>
        signature(col(vecName), hyperplanes(planesPerTable, dim, seed + t))
      }: _*)).as(Seq("table_id", "bucket")))

  /** Approximate top-k: `tables` independent hyperplane tables of
    * `planesPerTable` bits each; a corpus vector is a candidate for a
    * query if they share a bucket in ANY table (OR-construction).
    *
    * Shuffle discipline: the bucket join and the candidate `distinct()`
    * carry (query_id, neighbor_id) ids only — never the vectors — so the
    * shuffle rows are ~16 bytes, not ~1 KB of 64-dim doubles. Vectors are
    * re-attached afterwards: corpus side by one equi-join on neighbor_id,
    * query side broadcast. */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dim: Int, tables: Int = 16, planesPerTable: Int = 4,
              seed: Long = 42L): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), VectorFunctions.normalized(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), VectorFunctions.normalized(queryVec).as("qv"))
    // bucket on the RAW (double-cast) vectors: the sign of dot(v, plane)
    // is scale-invariant, and hashing the unnormalized values keeps the
    // signature arithmetic bit-reproducible outside Spark (the DuckDB
    // oracle re-derives identical buckets from the same plane literals)
    val cRaw = corpus.select(corpusId.as("neighbor_id"), corpusVec.cast("array<double>").as("craw"))
    val qRaw = queries.select(queryId.as("query_id"), queryVec.cast("array<double>").as("qraw"))
    val cand = bucketRows(cRaw, "neighbor_id", "craw", dim, tables, planesPerTable, seed)
      .join(broadcast(bucketRows(qRaw, "query_id", "qraw", dim, tables, planesPerTable, seed)),
        Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", VectorFunctions.dot(col("cv"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }
}
