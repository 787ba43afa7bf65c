package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensureRegistered(spark)
    val dir = "/root/testdata/sf0.1"
    val t = Tables(spark, dir)
    val n = 2; val threshold = 0.5
    val docs = t.documents.select(col("doc_id"), Dedup.shingleHashSet(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    docs.cache()
    println("[probe] docs=" + docs.count())
    val inv = docs.select(col("doc_id"), size(col("sh")).as("sh_n"), explode(col("sh")).as("shingle"))
    val freq = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    println("[probe] distinct shingles=" + freq.count())
    println("[probe] max df=" + freq.agg(max("df")).head.getLong(0))
    val ranked = inv.join(freq, "shingle")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
    val prefix = ranked.filter(col("pos") <= col("sh_n") - ceil(col("sh_n") * threshold) + 1)
    prefix.cache()
    println("[probe] prefix postings=" + prefix.count())
    val minOverlap = ceil(lit(threshold) / (1.0 + threshold) * (col("a.sh_n") + col("b.sh_n")))
    val candRaw = prefix.as("a").join(prefix.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
        col("b.sh_n") >= col("a.sh_n") * threshold &&
        col("b.sh_n") * threshold <= col("a.sh_n") &&
        lit(1) + least(col("a.sh_n") - col("a.pos"), col("b.sh_n") - col("b.pos")) >= minOverlap)
    val t0 = System.nanoTime()
    println("[probe] raw candidate postings=" + candRaw.count() + " in " + (System.nanoTime()-t0)/1e9 + "s")
    val cand = candRaw.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val t1 = System.nanoTime()
    println("[probe] distinct candidates=" + cand.count() + " in " + (System.nanoTime()-t1)/1e9 + "s")
    spark.stop()
  }
}
