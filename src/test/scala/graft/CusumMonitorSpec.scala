package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DropStats

/** A16 streaming: the CUSUM monitor over a tailed log stream — quiet
  * history raises no alarm, a planted rate shift latches exactly one
  * group after checkpoint resume, and the monitor's output is the
  * batch operator re-run on everything seen (the C18 twin law).
  */
class CusumMonitorSpec extends AnyFunSuite {
  import SparkTest._

  private def tmp(): String = Files.createTempDirectory("graft-cusum").toString

  /** `perApp(app) = lines per minute` over minutes [from, until). */
  private def lines(from: Int, until: Int, perApp: Map[String, Int]): Seq[String] =
    for {
      m <- from until until
      (app, n) <- perApp.toSeq.sortBy(_._1)
      i <- 0 until n
    } yield {
      val ts = f"2024-01-01T${m / 60}%02d:${m % 60}%02d:${i % 60}%02d+00:00"
      s"$ts host-1 production--$app/arn%3Aaws%3Aecs%3Aus-west-1%3A1%3Atask%2Ft-$m[$m]: " +
        s"""{"title":"t$m","level":"info"}"""
    }

  test("quiet history stays silent; a planted shift latches one group on resume") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    // phase 1: 20 flat minutes for both apps
    Files.write(Paths.get(in, "p1.log"),
      lines(0, 20, Map("app0" -> 3, "app1" -> 3)).asJava)
    DropStats.startCusumMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, slack = 1, threshold = 15)
      .awaitTermination()
    val quiet = spark.read.parquet(alarms)
    assert(quiet.count() == 40, "20 minutes x 2 apps")
    assert(quiet.filter(col("shifted")).count() == 0,
      "flat history must not alarm")

    // phase 2: app1's rate jumps 3 -> 8 for 20 more minutes; the
    // monitor resumes from the checkpoint and sees only the new file
    Files.write(Paths.get(in, "p2.log"),
      lines(20, 40, Map("app0" -> 3, "app1" -> 8)).asJava)
    DropStats.startCusumMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, slack = 1, threshold = 15)
      .awaitTermination()
    val after = spark.read.parquet(alarms)
    assert(after.count() == 80)
    val flagged = after.filter(col("shifted"))
      .select(col("grp")).distinct().collect().map(_.getString(0)).toSeq
    assert(flagged == Seq("app1"), s"only the shifted group alarms: $flagged")
    // the alarm LATCHES: once over threshold it stays over through the
    // end of the shifted regime
    val app1 = after.filter(col("grp") === "app1").orderBy(col("bucket"))
      .select(col("shifted")).collect().map(_.getBoolean(0))
    val first = app1.indexOf(true)
    assert(first >= 20, "cannot alarm before the shift begins")
    assert(app1.drop(first).forall(identity), "alarm must latch, not flap")

    // batch-twin law: monitor state after N files == cusumShift over
    // those N files' lines, row for row
    val all = graft.logs.LogColumns.enhance(
      spark.read.text(in), col("value"), "production")
    val twin = DropStats.cusumShift(
      all.filter(col("timestamp").isNotNull),
      col("container_app"), expr("unix_seconds(timestamp) div 60"),
      slack = 1, threshold = 15)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bucket", "n", "ref", "cusum", "shifted")
        .orderBy("grp", "bucket").collect().toSeq
    assert(canon(after) == canon(twin))
  }

  test("a bucket spanning micro-batches sums its partial counts") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    // the same minute arrives split across two files/batches
    Files.write(Paths.get(in, "h1.log"),
      lines(0, 1, Map("app0" -> 2)).asJava)
    DropStats.startCusumMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, slack = 0, threshold = 100)
      .awaitTermination()
    Files.write(Paths.get(in, "h2.log"),
      lines(0, 1, Map("app0" -> 3)).asJava)
    DropStats.startCusumMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, slack = 0, threshold = 100)
      .awaitTermination()
    val row = spark.read.parquet(alarms).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("n") == 5L,
      "2 lines in batch 1 + 3 in batch 2 = one bucket of 5")
  }
}
