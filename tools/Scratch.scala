package graft

import org.apache.spark.sql.DataFrame

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def time(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) Seq("qdedup_embedding") else args.toSeq
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("SCRATCH_EXPLAIN")) df.explain("formatted")
      time(n)(df)   // warm
      time(n)(SparkEntry.queries(n)(spark, sfDir))
    }
    spark.stop()
  }
}
