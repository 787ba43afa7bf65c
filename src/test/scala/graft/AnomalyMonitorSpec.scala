package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DropStats

/** A14/A17 streaming: the spike and seasonal monitors over a tailed
  * log stream share the CUSUM monitor's partial-count-table plumbing,
  * so each is pinned by the same law — monitor output after N files ≡
  * the batch operator over those N files' lines, row for row,
  * including across a checkpoint resume.
  */
class AnomalyMonitorSpec extends AnyFunSuite {
  import SparkTest._

  private def tmp(): String = Files.createTempDirectory("graft-anom").toString

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

  private def allParsed(in: String) =
    graft.logs.LogColumns.enhance(spark.read.text(in), col("value"), "production")
      .filter(col("timestamp").isNotNull)

  test("spike monitor == rateSpikes batch twin across a checkpoint resume") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    Files.write(Paths.get(in, "p1.log"),
      lines(0, 10, Map("app0" -> 3, "app1" -> 3)).asJava)
    DropStats.startSpikeMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, k = 2.0).awaitTermination()
    assert(spark.read.parquet(alarms).filter(col("spike")).count() == 0,
      "flat history must not spike")

    // one minute of app1 at 5x rate; the monitor resumes from the
    // checkpoint and sees only the new file
    Files.write(Paths.get(in, "p2.log"),
      lines(10, 11, Map("app0" -> 3, "app1" -> 15)).asJava)
    DropStats.startSpikeMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, k = 2.0).awaitTermination()
    val after = spark.read.parquet(alarms)
    val flagged = after.filter(col("spike"))
      .select(col("grp")).distinct().collect().map(_.getString(0)).toSeq
    assert(flagged == Seq("app1"), s"only the spiked group flags: $flagged")

    val twin = DropStats.rateSpikes(allParsed(in),
      col("container_app"), expr("unix_seconds(timestamp) div 60"), k = 2.0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bucket", "n", "mean_n", "sd_n", "spike")
        .orderBy("grp", "bucket").collect().toSeq
    assert(canon(after) == canon(twin))
  }

  test("psi monitor == psiOverCounts batch twin across a resume; drifted app moves") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    val refIn = tmp(); val refCounts = tmp() + "/ref"
    // reference window: both apps emit short lines (one length bucket)
    def padded(from: Int, until: Int, perApp: Map[String, Int], pad: Map[String, Int]) =
      for {
        m <- from until until
        (app, n) <- perApp.toSeq.sortBy(_._1)
        i <- 0 until n
      } yield {
        val ts = f"2024-01-01T${m / 60}%02d:${m % 60}%02d:${i % 60}%02d+00:00"
        s"$ts host-1 production--$app/arn%3Aaws%3Aecs%3Aus-west-1%3A1%3Atask%2Ft-$m[$m]: " +
          s"""{"title":"t$m${"x" * pad.getOrElse(app, 0)}","level":"info"}"""
      }
    Files.write(Paths.get(refIn, "ref.log"),
      padded(0, 10, Map("app0" -> 4, "app1" -> 4), Map.empty).asJava)
    DropStats.psiIngestCounts(spark.read.text(refIn), "production")
      .write.parquet(refCounts)

    // live phase 1: same shape as the reference -> PSI ~ 0 everywhere
    Files.write(Paths.get(in, "p1.log"),
      padded(10, 20, Map("app0" -> 4, "app1" -> 4), Map.empty).asJava)
    DropStats.startPsiMonitor(spark, in, ck, counts, alarms,
      "production", refCounts).awaitTermination()
    val calm = spark.read.parquet(alarms)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(calm.keySet == Set("app0", "app1"), s"got ${calm.keySet}")
    assert(calm.values.forall(_ < 0.1), s"same-shape window must read stable: $calm")

    // live phase 2: app1's lines grow ~256 chars (a new length bucket);
    // the monitor resumes from the checkpoint and sees only the new file
    Files.write(Paths.get(in, "p2.log"),
      padded(20, 30, Map("app0" -> 4, "app1" -> 4), Map("app1" -> 256)).asJava)
    DropStats.startPsiMonitor(spark, in, ck, counts, alarms,
      "production", refCounts).awaitTermination()
    val after = spark.read.parquet(alarms)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(after("app0") < 0.1, s"undrifted app stays stable: $after")
    assert(after("app1") > 0.25, s"half of app1's mass moved buckets: $after")

    // the twin law: monitor output after N files == psiOverCounts over
    // the pinned reference and those N files' ingest counts
    val twin = graft.operators.Profile.psiOverCounts(
        spark.read.parquet(refCounts)
          .select(col("grp").as("source"), col("bucket"), col("n")),
        DropStats.psiIngestCounts(spark.read.text(in), "production")
          .select(col("grp").as("source"), col("bucket"), col("n")))
      .select(col("source").as("grp"), col("n_buckets"), col("psi"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("grp").collect().toSeq
    assert(canon(spark.read.parquet(alarms)) == canon(twin))
  }

  test("a REPLAYED micro-batch is idempotent: no double-counted partials") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    Files.write(Paths.get(in, "p1.log"),
      lines(0, 10, Map("app0" -> 3, "app1" -> 3)).asJava)
    DropStats.startSpikeMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, k = 2.0).awaitTermination()
    val once = spark.read.parquet(counts)
      .agg(sum(col("n"))).head().getLong(0)

    // simulate a crash AFTER the batch's side effects but BEFORE the
    // commit log records it: remove commits/0 so the restarted stream
    // replays batch 0 over the same offsets — the replay must
    // OVERWRITE its own batch=0 partition, never double-append
    assert(Files.deleteIfExists(Paths.get(ck, "commits", "0")),
      "test setup: expected a commit file for batch 0")
    // the local ChecksumFileSystem leaves a .0.crc sidecar that would
    // fail the rewrite's rename — a real HDFS/S3 crash wouldn't have it
    Files.deleteIfExists(Paths.get(ck, "commits", ".0.crc")): Unit
    DropStats.startSpikeMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, k = 2.0).awaitTermination()
    spark.catalog.refreshByPath(counts)
    val twice = spark.read.parquet(counts)
      .agg(sum(col("n"))).head().getLong(0)
    assert(twice == once,
      s"replayed batch must not inflate the counts table: $once -> $twice")

    // and the recomputed verdicts still match the batch twin
    val twin = DropStats.rateSpikes(allParsed(in),
      col("container_app"), expr("unix_seconds(timestamp) div 60"), k = 2.0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bucket", "n", "mean_n", "sd_n", "spike")
        .orderBy("grp", "bucket").collect().toSeq
    assert(canon(spark.read.parquet(alarms)) == canon(twin))
  }

  test("a pre-partition-layout (flat) countsDir migrates to batch=legacy and keeps summing") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    // simulate the OLD layout: a monitor that appended partial counts
    // as root-level part files (pre batch=<id> partitioning) — counts
    // for minutes 0..9, whose source files have since been retired
    // from the input dir (so a fresh checkpoint won't re-ingest them)
    val legacyLines = lines(0, 10, Map("app0" -> 3, "app1" -> 3))
    graft.logs.LogColumns.enhance(
        spark.createDataset(legacyLines)(org.apache.spark.sql.Encoders.STRING).toDF("value"),
        col("value"), "production")
      .filter(col("timestamp").isNotNull)
      .select(col("container_app").as("grp"),
        expr("unix_seconds(timestamp) div 60").as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(counts) // tmp() pre-creates the dir
    val legacyTotal = spark.read.parquet(counts)
      .agg(sum(col("n"))).head().getLong(0)

    // restart the monitor over the flat dir with only NEW input: the
    // start-time migration must move the root part files into
    // batch=legacy so batch=0 can land beside them — without it the
    // post-batch read fails partition discovery and bricks the monitor
    Files.write(Paths.get(in, "p2.log"),
      lines(10, 11, Map("app0" -> 3, "app1" -> 15)).asJava)
    DropStats.startSpikeMonitor(spark, in, ck, counts, alarms,
      "production", bucketSeconds = 60, k = 2.0).awaitTermination()
    spark.catalog.refreshByPath(counts)
    assert(!Files.list(Paths.get(counts)).iterator().asScala
        .exists(p => p.toFile.isFile && p.getFileName.toString.startsWith("part-")),
      "no root-level part files may remain after migration")
    assert(Files.isDirectory(Paths.get(counts, "batch=legacy")),
      "legacy part files move into a batch=legacy partition")
    val total = spark.read.parquet(counts).agg(sum(col("n"))).head().getLong(0)
    assert(total == legacyTotal + 18,
      s"legacy counts keep summing beside the new batch: $legacyTotal -> $total")

    // and the verdicts equal the batch twin over legacy + new lines
    val allLines = legacyLines ++ lines(10, 11, Map("app0" -> 3, "app1" -> 15))
    val twin = DropStats.rateSpikes(
      graft.logs.LogColumns.enhance(
          spark.createDataset(allLines)(org.apache.spark.sql.Encoders.STRING).toDF("value"),
          col("value"), "production")
        .filter(col("timestamp").isNotNull),
      col("container_app"), expr("unix_seconds(timestamp) div 60"), k = 2.0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bucket", "n", "mean_n", "sd_n", "spike")
        .orderBy("grp", "bucket").collect().toSeq
    assert(canon(spark.read.parquet(alarms)) == canon(twin))
  }

  test("seasonal monitor == seasonalResiduals batch twin across a resume") {
    val in = tmp(); val ck = tmp(); val counts = tmp(); val alarms = tmp()
    // season = 12 one-minute buckets (a single outlier among nb
    // residuals peaks at z = sqrt(nb-1), so nb must exceed k^2 + 1 for
    // the plant to clear the cut); season 1 establishes the baseline
    Files.write(Paths.get(in, "s1.log"),
      lines(0, 12, Map("app0" -> 2, "app1" -> 4)).asJava)
    DropStats.startSeasonalMonitor(spark, in, ck, counts, alarms,
      "production", lag = 12, bucketSeconds = 60, k = 3.0).awaitTermination()
    val first = spark.read.parquet(alarms)
    assert(first.filter(col("anomalous").isNotNull).count() == 0,
      "first-season buckets have no baseline: NULL verdicts, not false")

    // season 2 repeats the shape except one planted minute on app1
    Files.write(Paths.get(in, "s2.log"),
      (lines(12, 20, Map("app0" -> 2, "app1" -> 4)) ++
        lines(20, 21, Map("app0" -> 2, "app1" -> 14)) ++
        lines(21, 24, Map("app0" -> 2, "app1" -> 4))).asJava)
    DropStats.startSeasonalMonitor(spark, in, ck, counts, alarms,
      "production", lag = 12, bucketSeconds = 60, k = 3.0).awaitTermination()
    val after = spark.read.parquet(alarms)
    val flagged = after.filter(col("anomalous"))
      .select(col("grp"), col("bucket")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // buckets are epoch-minutes: 2024-01-01T00:00Z = 28401120
    assert(flagged == Seq(("app1", 28401120L + 20L)),
      s"exactly the planted (app1, minute 20) anomaly flags: $flagged")

    val twin = DropStats.seasonalResiduals(allParsed(in),
      col("container_app"), expr("unix_seconds(timestamp) div 60"),
      lag = 12, k = 3.0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "bucket", "n", "n_prev", "resid", "mean_r", "sd_r",
          "anomalous")
        .orderBy("grp", "bucket").collect().toSeq
    assert(canon(after) == canon(twin))
  }
}
