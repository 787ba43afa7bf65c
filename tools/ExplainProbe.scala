object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("qcuration_pipeline")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
