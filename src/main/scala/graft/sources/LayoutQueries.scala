package graft.sources

import graft.Q
import org.apache.spark.sql.functions._

/** Driver-gated proof of the bucketed layout (SURVEY.md §2.D2b): write
  * two tables co-bucketed on the join key via [[Layout.writeBucketed]],
  * join them bucket-to-bucket, and aggregate. The layout is
  * value-transparent (like q19's salting), so the DuckDB oracle is the
  * same join over the PLAIN parquet tables — a hash match proves the
  * bucketed storage path changes nothing but the plan, while
  * LayoutSpec separately asserts the plan it buys (zero Exchange on
  * the join and on bucket-key aggregation).
  */
object LayoutQueries {

  private val D = org.apache.spark.sql.types.DecimalType(18, 4)

  val qBucketedJoin = Q(
    "qlayout_bucketed_join",
    (s, dir) => {
      val t = Tables(s, dir)
      // layout step: one shuffle each, amortized into storage — at
      // cluster scale this runs once per ingest, not per query
      Layout.writeBucketed(
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_q_orders_bucketed", buckets = 8, key = "o_custkey")
      Layout.writeBucketed(
        t.customer.select("c_custkey", "c_mktsegment"),
        "graft_q_customer_bucketed", buckets = 8, key = "c_custkey")
      val o = s.table("graft_q_orders_bucketed")
      val c = s.table("graft_q_customer_bucketed")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
        .orderBy(col("mktsegment"))
    },
    Some("""
      SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
      ORDER BY mktsegment"""))

  /** Driver-gated proof of the Z-ordered layout (D12), same
    * value-transparency discipline as the bucketed query: write
    * lineitem z-ordered on (l_partkey, l_suppkey), read it back
    * FILTERED on one of the clustered columns, aggregate — the oracle
    * is the same filter+aggregate over the plain parquet, so a hash
    * match proves the Morton clustering changes nothing but file
    * locality (which LayoutSpec separately proves it buys). */
  val qZOrdered = Q(
    "qlayout_zorder_roundtrip",
    (s, dir) => {
      val t = Tables(s, dir)
      val out = graft.Q.scratchDir(s, "q_zorder_li")
      Layout.writeZOrdered(
        t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice"),
        out, Seq("l_partkey", "l_suppkey"), files = 16,
        saveMode = org.apache.spark.sql.SaveMode.Overwrite)
      s.read.parquet(out)
        .filter(col("l_suppkey") <= 20)
        .groupBy(col("l_suppkey"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D)).cast("double").as("sum_price"))
        .orderBy(col("l_suppkey"))
    },
    Some("""
      SELECT l_suppkey, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_suppkey <= 20
      GROUP BY l_suppkey
      ORDER BY l_suppkey"""))

  /** Driver-gated proof of the snapshot upsert (D13): base = the docs
    * outside one residue class, increment = another residue class with
    * REWRITTEN text — so the merge has genuine updates (ids in both,
    * increment text must win byte-for-byte), pure inserts (ids only in
    * the increment) and untouched survivors, and none of the three
    * paths is vacuous. The oracle recomputes anti-join + union in SQL.
    */
  val qMerge = Q(
    "qlayout_merge",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(
        col("doc_id"), col("text"), col("source"))
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      val inc = docs.filter(col("doc_id") % 3 === 0)
        .withColumn("text", upper(col("text")))
      Layout.mergeSnapshot(base, inc, "doc_id").orderBy(col("doc_id"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 5 <> 0),
      inc AS (
        SELECT doc_id, upper(text) AS text, source FROM documents
        WHERE doc_id % 3 = 0)
      SELECT doc_id, text, source FROM base
      WHERE doc_id NOT IN (SELECT doc_id FROM inc)
      UNION ALL
      SELECT doc_id, text, source FROM inc
      ORDER BY doc_id"""))

  /** D15: gzip-JSONL corpus round-trip — the interchange format the
    * ML-data world actually ships (one JSON object per line, gzip
    * members concatenate, any line-oriented tool streams it). Write
    * documents as compressed JSONL, read back with an EXPLICIT schema
    * (inference on a corpus-sized read is a second full scan and can
    * drift types — doc_id long vs int — between runs), and hash-match
    * the original rows: proves JSON escaping round-trips newlines,
    * quotes and unicode in `text` byte-exactly. Value-transparent like
    * the zorder twin, so the oracle is the plain table. */
  val qJsonl = Q(
    "qlayout_jsonl",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val out = graft.Q.scratchDir(s, "q_jsonl")
      docs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("compression", "gzip").json(out)
      s.read.schema("doc_id BIGINT, text STRING, lang STRING, source STRING")
        .json(out)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id"""))

  /** ORC interchange round-trip (D17) — the other columnar format a
    * Spark-native engine must speak (Hive-ecosystem handoffs arrive
    * and leave as ORC): write documents with zlib compression, read
    * back under the same schema, hash-match the original rows. Like
    * parquet, ORC is splittable with predicate-pushdown-capable
    * stripes, so the 100 TB read path keeps partition fan-out and
    * filter pushdown; value-transparent like the jsonl twin, so the
    * oracle is the plain table. */
  val qOrc = Q(
    "qlayout_orc",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"))
      val out = graft.Q.scratchDir(s, "q_orc")
      docs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("compression", "zlib").orc(out)
      s.read.orc(out)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      FROM documents ORDER BY doc_id"""))

  /** CSV interchange round-trip (D14) — the remaining bulk-interchange
    * format next to parquet and NDJSON: write with Spark's quoting
    * (embedded commas and quote characters in the `tricky` column
    * force real quoting+escaping, not the happy path), read back under
    * an explicit schema, and hash-compare against the parquet truth.
    * Timestamps travel as unix-micros longs (the suite's canonical
    * parity time) — CSV has no timestamp type, and a string format
    * would re-open every timezone/precision trap the long avoids.
    * Scale notes in the writer's favor: default (single-line) CSV
    * stays SPLITTABLE — one 100 GB file still fans out by range;
    * fields with embedded NEWLINES would need multiLine=true reads,
    * which makes each file one task — keep newlines out of
    * interchange CSV (scrub or \\n-escape upstream) rather than
    * paying an unsplittable scan. */
  val qCsv = Q(
    "qlayout_csv",
    (s, dir) => {
      val src = Tables(s, dir).orders.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        concat(col("o_orderstatus"), lit(",\"q"), col("o_orderpriority"))
          .as("tricky"))
      val out = graft.Q.scratchDir(s, "q_csv")
      src.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, o_us BIGINT, tricky STRING")
        .csv(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_us"), col("tricky"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             epoch_us(o_orderdate) AS o_us,
             o_orderstatus || ',"q' || o_orderpriority AS tricky
      FROM orders ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(qBucketedJoin, qZOrdered, qMerge, qJsonl, qCsv, qOrc)
}
