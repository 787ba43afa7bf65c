package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import SparkTest._

  test("csv and jsonl readers produce the same rows as parquet") {
    val dir = Files.createTempDirectory("graft-src").toString
    val csv = Paths.get(dir, "t.csv")
    Files.write(csv, Seq("id,name", "1,a", "2,b").asJava)
    val jsonl = Paths.get(dir, "t.jsonl")
    Files.write(jsonl, Seq("""{"id":1,"name":"a"}""", """{"id":2,"name":"b"}""").asJava)

    val fromCsv = Sources.read(spark, csv.toString)
      .select(col("id").cast("long"), col("name")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromJson = Sources.read(spark, jsonl.toString)
      .select(col("id").cast("long"), col("name")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromCsv == Set((1L, "a"), (2L, "b")))
    assert(fromJson == fromCsv)
  }

  test("sink NDJSON output round-trips through readStreamOutput") {
    val out = Files.createTempDirectory("graft-rt").toString
    val d = new graft.sinks.FileDelivery(out)
    d.deliver("s1", Seq("""{"k":1}""".getBytes, """{"k":2}""".getBytes))
    val got = Sources.readStreamOutput(spark, s"$out/s1")
      .agg(sum(col("k"))).head().getLong(0)
    assert(got == 3L)
  }
}
