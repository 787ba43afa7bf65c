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

  /** Sign-bit signature of a vector against one table's hyperplanes. */
  private def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = VectorFunctions.dot(vec, typedLit(p))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: `tables` independent hyperplane tables of
    * `planesPerTable` bits each; a corpus vector is a candidate for a
    * query if they share a bucket in ANY table (OR-construction). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dim: Int, tables: Int = 8, planesPerTable: Int = 4,
              seed: Long = 42L): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    def bucketed(df: DataFrame, id: Column, vec: Column, idName: String): DataFrame = {
      val v = df.select(id.as(idName), VectorFunctions.normalized(vec).as(s"${idName}_v"))
      v.select(col(idName), col(s"${idName}_v"), posexplode(array(
        (0 until tables).map { t =>
          signature(col(s"${idName}_v"), hyperplanes(planesPerTable, dim, seed + t))
        }: _*)).as(Seq("table_id", "bucket")))
    }
    val c = bucketed(corpus, corpusId, corpusVec, "neighbor_id")
    val q = bucketed(queries, queryId, queryVec, "query_id")
    val cand = c.join(broadcast(q), Seq("table_id", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_v"), col("neighbor_id_v"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .withColumn("cosine", VectorFunctions.dot(col("neighbor_id_v"), col("query_id_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cosine"), 4).as("cosine"))
  }
}
