package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries execute into the `noop` sink — a plain `.count()` would let
  * Catalyst prune projections and under-report map-heavy queries (a
  * pure-projection pipeline would measure ~0). A warmup query absorbs
  * one-time session/codegen cost so per-query numbers are comparable.
  *
  * Each query is timed TWICE and the min reported: a single-shot timer
  * conflates per-query JIT/page-cache variance and transient machine
  * load with code cost (a noisy host once turned a 13 s query into a
  * phantom 64 s "regression"). The min of two runs is the standard
  * noise-robust point estimate for a deterministic workload.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      // some queries persist an intermediate frame (e.g. the ngram shingle
      // cache); every timed run must recompute it or min-of-two would
      // report a warm-cache number
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** Min of two runs; a failure on either run marks the query failed. */
    def run(name: String): Double = {
      val a = runOnce(name)
      if (a < 0) return -1.0
      val b = runOnce(name)
      if (b < 0) -1.0 else math.min(a, b)
    }

    // warmup: first query pays session + codegen startup; don't let that
    // land on an arbitrary query's number.
    runOnce("q01_pricing_summary")

    // SPARK_GRAFT_ONLY=q1,q2 narrows to named queries for local iteration;
    // unset (the driver's mode) runs everything. Unknown names warn loudly
    // instead of silently shrinking the run (a typo must not read as a
    // clean bench).
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(list) =>
        val asked = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val (known, unknown) = asked.partition(SparkEntry.queries.contains)
        if (unknown.nonEmpty)
          System.err.println(s"[bench] WARNING: unknown SPARK_GRAFT_ONLY queries ignored: ${unknown.mkString(", ")}")
        known.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query (-1 marker) must not make the headline number look
    // FASTER: report total=-1 plus an explicit failure count
    val failures = results.count(_._2 < 0)
    val total = if (failures > 0) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
