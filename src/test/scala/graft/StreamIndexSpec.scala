package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamIndex

/** C154 streaming: the BQ index-append stream is pinned by the same
  * twin law as the monitors — codes table after N files ≡ bqEncode
  * over those N files' rows under the frozen stats, row for row,
  * including across a checkpoint resume AND a replayed micro-batch —
  * and the streamed table is a first-class citizen of the search path
  * (bqTopKAgainstIndex parity with the batch-built index).
  */
class StreamIndexSpec extends AnyFunSuite {
  import SparkTest._

  private def tmp(): String = Files.createTempDirectory("graft-sidx").toString

  /** Write `df` as ONE parquet file named `name` directly in `dir`
    * (the file-stream source lists plain files, not writer subdirs). */
  private def dropFile(df: org.apache.spark.sql.DataFrame, dir: String,
                       name: String): Unit = {
    val scratch = Files.createTempDirectory("graft-sidx-w").toString
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = Files.list(Paths.get(scratch)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $scratch"))
    Files.move(part, Paths.get(dir, name)): Unit
  }

  private def canonCodes(path: String) = {
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path).select("vec_id", "codes")
      .collect().map(_.toString).sorted.toSeq
  }

  test("streamed codes == frozen-stats batch encode, across resume and a replayed batch") {
    val e = graft.sources.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val in = tmp(); val ck = tmp(); val statsDir = tmp() + "/stats"
    val codesDir = tmp() + "/codes"

    // train ONCE on the full corpus, freeze the thresholds
    Similarity.bqTrain(e, col("vec_id"), col("embedding"))
      .write.parquet(statsDir)
    val stats = spark.read.parquet(statsDir)

    val half1 = e.filter(col("vec_id") % 2 === 0)
    val half2 = e.filter(col("vec_id") % 2 === 1)
    dropFile(half1, in, "p1.parquet")
    StreamIndex.startBqIndexAppend(spark, in, e.schema, "vec_id", "embedding",
      ck, statsDir, codesDir).awaitTermination()
    assert(canonCodes(codesDir) ==
      Similarity.bqEncode(half1, col("vec_id"), col("embedding"), stats)
        .collect().map(_.toString).sorted.toSeq,
      "first batch's codes must equal the frozen-stats batch encode")

    // resume from the checkpoint: only the new file is encoded, and
    // the summed table equals the batch encode over BOTH files
    dropFile(half2, in, "p2.parquet")
    StreamIndex.startBqIndexAppend(spark, in, e.schema, "vec_id", "embedding",
      ck, statsDir, codesDir).awaitTermination()
    val unionCodes = Similarity.bqEncode(e, col("vec_id"), col("embedding"), stats)
      .collect().map(_.toString).sorted.toSeq
    assert(canonCodes(codesDir) == unionCodes,
      "after resume the codes table must equal the batch encode of the union")

    // replay: drop the last commit record so the restarted stream
    // re-runs the final batch — its partition must be REPLACED, never
    // duplicated (the monitor plumbing's idempotence pattern)
    val commits = Paths.get(ck, "commits")
    val last = Files.list(commits).toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.matches("\\d+"))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(last)
    Files.deleteIfExists(Paths.get(ck, "commits", "." + last.getFileName + ".crc"))
    StreamIndex.startBqIndexAppend(spark, in, e.schema, "vec_id", "embedding",
      ck, statsDir, codesDir).awaitTermination()
    assert(canonCodes(codesDir) == unionCodes,
      "a replayed batch must not duplicate or lose codes")

    // the streamed table is a first-class search input: searching
    // against it equals searching against the batch-built index
    spark.catalog.refreshByPath(codesDir)
    val streamed = spark.read.parquet(codesDir).select("vec_id", "codes")
    val qset = e.filter(col("vec_id") < 5)
    val viaStream = Similarity.bqTopKAgainstIndex(stats, streamed,
      e, col("vec_id"), col("embedding"), qset, col("vec_id"), col("embedding"),
      k = 5, shortlist = 32).collect().map(_.toString).sorted.toSeq
    val (bs, bc) = Similarity.bqIndex(e, col("vec_id"), col("embedding"))
    val viaBatch = Similarity.bqTopKAgainstIndex(bs, bc,
      e, col("vec_id"), col("embedding"), qset, col("vec_id"), col("embedding"),
      k = 5, shortlist = 32).collect().map(_.toString).sorted.toSeq
    assert(viaStream == viaBatch,
      "search over the streamed codes must equal the batch-built index")
  }
}
