package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derive an N× scale-proxy dataset from a driver scale-factor dir —
  * the second scale point the bench needs when the environment ships
  * no larger driver SF (r17: only sf0.001/0.01/0.1 exist, and the
  * testdata tree is read-only). Fact tables replicate `factor`× into
  * DISJOINT id ranges (offset = (max id + 1) · replica) — orders and
  * lineitem in LOCKSTEP on the one shared o_orderkey offset so every
  * replica's join edges stay intact — while dimension tables copy
  * as-is: the realistic growth shape (more transactions / events /
  * documents / vectors against the same dimensions). Replicas carry
  * the source rows verbatim, so the proxy measures CONSTANT FACTORS
  * and shuffle scaling under a known distribution rather than
  * inventing data; the near-dup/ANN operators consequently see an
  * every-row-duplicated corpus — a deliberately adversarial but legal
  * shape for them (each dup set grows factor×), documented wherever
  * the proxy's numbers are recorded. Reads through [[sources.Tables]]
  * so the events timestamp normalization matches what every query
  * consumes; writes plain parquet the same Tables loader reads back.
  *
  * Usage: runMain graft.ScaleProxy <srcSfDir> <dstDir> <factor>
  */
object ScaleProxy {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = sources.Tables(spark, src)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    /** `factor` unioned replicas, each id column shifted by its own
      * offset · replica — offsets are explicit so tables sharing a key
      * domain (orders/lineitem) shift in lockstep. */
    def rep(df: DataFrame, offs: Map[String, Long]): DataFrame =
      (0 until factor).map { r =>
        offs.foldLeft(df) { case (d, (c, off)) =>
          d.withColumn(c, col(c) + lit(r.toLong * off))
        }
      }.reduce(_.unionByName(_))

    def maxId(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(t.table(n), n))
    val orderOff = maxId(t.orders, "o_orderkey") // ONE offset for both sides
    write(rep(t.orders, Map("o_orderkey" -> orderOff)), "orders")
    write(rep(t.lineitem, Map("l_orderkey" -> orderOff)), "lineitem")
    write(rep(t.events, Map("event_id" -> maxId(t.events, "event_id"))), "events")
    write(rep(t.documents, Map("doc_id" -> maxId(t.documents, "doc_id"))), "documents")
    write(rep(t.embeddings, Map("vec_id" -> maxId(t.embeddings, "vec_id"))), "embeddings")
    // scalastyle:off println
    println(s"[scale-proxy] wrote ${factor}x of $src to $dst")
    // scalastyle:on println
    spark.stop()
  }
}
