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

  test("Tables.events canonicalizes ts to epoch-ns long on any parquet layout") {
    // The testdata has shipped `events.ts` as both TIMESTAMP(NANOS)
    // (Spark reads a raw ns long) and TIMESTAMP(MICROS) (Spark reads
    // TIMESTAMP_NTZ). Every consumer assumes the canonical epoch-ns
    // long — pin the accessor's contract on whatever layout is present.
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val ts = t.events.schema("ts")
    assert(ts.dataType == org.apache.spark.sql.types.LongType)
    // values must be epoch NANOseconds: any 2015+ epoch-ns value is
    // >= 1.4e18; epoch-µs would be ~1.4e15 and epoch-s ~1.4e9.
    val mn = t.events.agg(min(col("ts"))).head().getLong(0)
    assert(mn > 1_000_000_000_000_000_000L, s"ts=$mn is not epoch-ns scale")
    // the SQL facade must expose the same canonical column
    val sqlMin = graft.GraftSql
      .run(spark, "/root/testdata/sf0.001", "SELECT min(ts) AS m FROM events")
      .head().getLong(0)
    assert(sqlMin == mn)
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
