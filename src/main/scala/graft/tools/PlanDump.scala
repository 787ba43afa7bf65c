package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: print the executed-plan skeleton (exchanges, joins,
  * scans, window rescues) of the queries named in args. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("qtext_bpe_apply_vocab", "qgraph_khop_typed", "qann_bq")
    for (q <- names) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator.map(_.trim).filter(l =>
        l.contains("Exchange") || l.contains("Join") ||
          l.contains("Scan parquet") || l.contains("WindowGroupLimit"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
