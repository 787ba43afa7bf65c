package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only profiling harness for one registered query (the guide §1
  * "measure first" loop, made repeatable):
  *
  *   sbt "runMain graft.tools.Profile <query> [sfDir] [planOut]"
  *
  * Runs the query once into the noop sink (the Bench timing contract)
  * on `local[$SPARK_GRAFT_CPUS|32]`, printing
  *   - wall seconds for the noop write,
  *   - a per-JOB table (jobId, seconds, first-stage name) — at sf0.1
  *     the registry's heavy gates are job-count-bound, so this table
  *     IS the profile: it shows which eager step (persist
  *     materialization, localCheckpoint, collect barrier) each second
  *     belongs to,
  *   - the number of jobs / stages / tasks,
  * and writes `explain("formatted")` of the query frame to `planOut`
  * when given (the plans/r17 deliverable files come from here).
  * A second timed run (same process, cleared cache) separates
  * first-run JIT/codegen cost from steady-state. */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [sfDir] [planOut]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val planOut = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, sec: Double, stages: Int, tasks: Int, desc: String)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, Int, String)]()
    val jobs = new ConcurrentLinkedQueue[Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), js.stageInfos.size,
          js.stageInfos.map(_.numTasks).sum, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          jobs.add(Job(je.jobId, (System.nanoTime() - s._1) / 1e9, s._2, s._3, s._4))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (wall > 0.3) {
          val m = si.taskMetrics
          println(f"  [stage ${si.stageId}%3d] $wall%6.2f s wall, " +
            f"run=${m.executorRunTime / 1e3}%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"tasks=${si.numTasks}%4d  ${si.name.take(60)} @ ${si.details.linesIterator.filter(_.contains("graft")).take(1).mkString.trim.take(80)}")
        }
      }
    })

    def once(label: String): Double = {
      spark.catalog.clearCache()
      jobs.clear()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give tail events a moment
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_.id)
      println(f"== $name $label: $sec%.2f s, ${js.size} jobs, " +
        f"${js.map(_.stages).sum} stages, ${js.map(_.tasks).sum} tasks")
      js.foreach(j => println(f"  job ${j.id}%3d ${j.sec}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}"))
      sec
    }

    once("run1")
    once("run2")

    planOut.foreach { p =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(p)
      Option(f.getParentFile).foreach(_.mkdirs())
      java.nio.file.Files.write(f.toPath,
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"plan written: $p")
    }
    spark.stop()
    System.exit(0)
  }
}
