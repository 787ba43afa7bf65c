package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Batch analytics core (SURVEY.md §2.B).
  *
  * Oracle-parity rules (SURVEY.md §6):
  *  - double aggregates accumulate as DECIMAL(18,4) then cast to double,
  *    so summation order can't flip low-order bits vs DuckDB;
  *  - event time is canonical epoch-MICROSECONDS BIGINT (`ts div 1000`
  *    in Spark ≡ `epoch_us(ts)` in DuckDB — both truncate the parquet
  *    ns value), so all time arithmetic is exact integer math;
  *  - every output integer is BIGINT, every rank/count cast to long;
  *  - deterministic ORDER BY with unique tie-breakers on both sides.
  *
  * Scale notes (SURVEY.md §5): dim tables (region/nation/supplier/part/
  * customer) carry an explicit `broadcast` hint; fact-side groupBys
  * shuffle once on their keys with map-side partial aggregation; AQE
  * handles skew/coalescing at runtime.
  */
object Analytics {
  private val D = DecimalType(18, 4)
  private val S = DecimalType(9, 4)
  private def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  // Products of doubles have long decimal tails that can round differently
  // across engines at the DECIMAL(,4) boundary; casting each *input* to
  // decimal first makes the multiplication exact and engine-independent.
  private def revenueTerm: Column =
    col("l_extendedprice").cast(D) * (lit(1.0) - col("l_discount")).cast(S)
  private def chargeTerm: Column =
    revenueTerm * (lit(1.0) + col("l_tax")).cast(S)

  /** events with exact-parity microsecond epoch column `ts_us`. */
  private def eventsUs(t: Tables): DataFrame =
    t.events.withColumn("ts_us", expr("ts div 1000"))

  // B1: filtered multi-key aggregation (TPC-H Q1 shape).
  val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenueTerm).cast("double").as("sum_disc_price"),
          sum(chargeTerm).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4)) * CAST(1.0 + l_tax AS DECIMAL(9,4))) AS DOUBLE) AS sum_charge,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // B2: join + agg + deterministic top-k.
  val q02 = Q(
    "q02_revenue_topk",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
        .limit(10)
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
      LIMIT 10"""))

  // B3: multi-way join, dims broadcast, date-range filter pushed down.
  val q03 = Q(
    "q03_region_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"))
    },
    Some("""
      SELECT r_name, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY r_name
      ORDER BY r_name"""))

  // B4: EXISTS via left_semi.
  val q04 = Q(
    "q04_semi_join",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // B5: NOT EXISTS via left_anti.
  val q05 = Q(
    "q05_anti_join",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name, COUNT(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY n_name
      ORDER BY n_name"""))

  // B6: window rank — top-3 parts per brand by price.
  val q06 = Q(
    "q06_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(s, dir).part
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rnk"))
        .orderBy(col("p_brand"), col("rnk"))
    },
    Some("""
      SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
        FROM part) t
      WHERE rnk <= 3
      ORDER BY p_brand, rnk"""))

  // B7: running total per customer (decimal-exact window sum).
  val q07 = Q(
    "q07_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir).orders
        .withColumn("run_total", sum(col("o_totalprice").cast(D)).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS run_total
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  // B8: distinct + INTERSECT/EXCEPT set algebra.
  val q08 = Q(
    "q08_distinct_setops",
    (s, dir) => {
      val t = Tables(s, dir)
      val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")).distinct()
      val big = t.orders.filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey").as("custkey")).distinct()
      val negBal = t.customer.filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      urgent.intersect(big).except(negBal).orderBy(col("custkey"))
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_totalprice > 200000
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_acctbal < 0
      ORDER BY custkey"""))

  // B9: ROLLUP aggregation.
  val q09 = Q(
    "q09_rollup",
    (s, dir) => {
      Tables(s, dir).orders
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // B10: exact interpolated percentiles per group.
  // B10b: the 100 TB percentile path — percentile_approx (streaming
  // KLL-style sketch, one pass, bounded memory) where the exact
  // percentile's per-group sort won't fly. Approximate by construction
  // → no DuckDB oracle (the driver records rows-only); AnalyticsSpec
  // bounds it against the exact q10 values instead, like HLL.
  val q10b = Q(
    "q10b_percentiles_approx",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"))
        .orderBy(col("event_type"))
    },
    None)

  val q10 = Q(
    "q10_percentiles",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          expr("round(percentile(value, 0.5D), 4)").as("p50"),
          expr("round(percentile(value, 0.9D), 4)").as("p90"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
        ROUND(quantile_cont(value, 0.5), 4) AS p50,
        ROUND(quantile_cont(value, 0.9), 4) AS p90
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // B11: JSON field extraction from events.props.
  val q11 = Q(
    "q11_json_extract",
    (s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          sum(k).as("sum_k"),
          count(when(k > 50, lit(1))).as("n_big"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // B12: time bucketing on exact integer microseconds.
  val q12 = Q(
    "q12_time_bucket",
    (s, dir) => {
      eventsUs(Tables(s, dir))
        .withColumn("day_epoch", expr("(ts_us div 86400000000) * 86400"))
        .groupBy(col("day_epoch"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("day_epoch"), col("event_type"))
    },
    Some("""
      SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_epoch, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY day_epoch, event_type"""))

  // B13: as-of join — most recent order at or before each event.
  // NOTE: this windowed formulation buffers ALL candidate (event, order)
  // pairs per event before ranking — it exists as the composition
  // cross-check baseline that triangulates the native operator's oracle.
  // At scale use graft.plans.AsOfJoin.join (q13b/q13c): one shuffle+sort
  // per side, O(n+m) streaming merge, O(1) state per key.
  val q13 = Q(
    "q13_asof_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = eventsUs(t).select(col("event_id"), col("user_id"), col("ts_us"))
      val o = t.orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      val w = Window.partitionBy(col("event_id")).orderBy(col("od_us").desc, col("o_orderkey").desc)
      e.join(o, col("user_id") === col("o_custkey") && col("od_us") <= col("ts_us"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("o_orderkey").as("asof_orderkey"), col("o_totalprice").as("asof_totalprice"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, asof_orderkey, asof_totalprice FROM (
        SELECT e.event_id AS event_id, o.o_orderkey AS asof_orderkey,
               o.o_totalprice AS asof_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                 ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON e.user_id = o.o_custkey
         AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)) t
      WHERE rn = 1
      ORDER BY event_id"""))

  // B13b: the same as-of semantics through the CUSTOM physical operator
  // (graft.plans.AsOfJoin — LogicalPlan + Strategy + sort-merge exec).
  // Same oracle as q13: the hash-match proves the native operator agrees
  // with both the window-based composition and DuckDB.
  val q13b = Q(
    "q13b_asof_custom",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val t = Tables(s, dir)
      val e = eventsUs(t).select(col("event_id"), col("user_id"), col("ts_us"))
      val o = t.orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      graft.plans.AsOfJoin.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts_us", rightTime = "od_us",
          rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey").as("asof_orderkey"),
          col("o_totalprice").as("asof_totalprice"))
        .orderBy(col("event_id"))
    },
    q13.oracle)

  // B13c: the native as-of join with a bounded lookback (pandas
  // merge_asof `tolerance`): a left row matches only when the latest
  // right row is within toleranceUs. Equivalent to restricting the
  // oracle's join to the tolerance window — the latest overall IS the
  // closest, so "latest, then check tolerance" and "latest within
  // tolerance" coincide. 8500 days keeps roughly half the sf matches
  // (measured gap distribution ~8200-8800 days), so the bound is
  // actually exercised.
  val q13c = Q(
    "q13c_asof_tolerance",
    (s, dir) => {
      graft.GraftExtensions.ensureRegistered(s)
      val t = Tables(s, dir)
      val e = eventsUs(t).select(col("event_id"), col("user_id"), col("ts_us"))
      val o = t.orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      graft.plans.AsOfJoin.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts_us", rightTime = "od_us",
          rightTieBreak = Seq("o_orderkey"),
          toleranceUs = Some(8500L * 86400000000L))
        .select(col("event_id"), col("o_orderkey").as("asof_orderkey"),
          col("o_totalprice").as("asof_totalprice"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, asof_orderkey, asof_totalprice FROM (
        SELECT e.event_id AS event_id, o.o_orderkey AS asof_orderkey,
               o.o_totalprice AS asof_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                 ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON e.user_id = o.o_custkey
         AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
         AND epoch_us(o.o_orderdate) >= epoch_us(e.ts) - 734400000000000) t
      WHERE rn = 1
      ORDER BY event_id"""))

  // B14: time-range self-join — follow-up events within 5 minutes.
  val q14 = Q(
    "q14_range_join",
    (s, dir) => {
      val e = eventsUs(Tables(s, dir)).select(col("user_id"), col("ts_us"))
      val e1 = e.as("e1")
      val e2 = e.as("e2")
      e1.join(e2,
          col("e1.user_id") === col("e2.user_id") &&
          col("e2.ts_us") > col("e1.ts_us") &&
          col("e2.ts_us") <= col("e1.ts_us") + lit(300000000L))
        .groupBy(col("e1.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
      FROM events e1
      JOIN events e2 ON e1.user_id = e2.user_id
       AND epoch_us(e2.ts) > epoch_us(e1.ts)
       AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 300000000
      GROUP BY e1.user_id
      ORDER BY user_id"""))

  /** Interval-overlap join (SURVEY.md §2.B25): all (a, b) with
    * `[sa, ea) ∩ [sb, eb) ≠ ∅` — interval×interval, the join family
    * member B14's point-in-range shape cannot express and Spark has
    * no native operator for: without an equi key the naive plan is a
    * BroadcastNestedLoopJoin over the full cross product.
    *
    * Blocking makes it an EQUI-join: each interval explodes into the
    * fixed-width CELLS it spans. Overlapping intervals both contain
    * some common point t, hence both emit cell(t) — the cell join is
    * a LOSSLESS candidate generator and the exact predicate prunes
    * false cell-mates. Duplicate elimination is arithmetic, not a
    * distinct shuffle: a pair is emitted only from the cell holding
    * the overlap's FIRST point (`cell == greatest(sa, sb) div w`) —
    * exactly one cell qualifies per pair.
    *
    * Scale shape: explode is map-side (span/cellWidth rows per
    * interval, fail-fast capped at `maxCellsPerRow` — size the cell
    * width to the span distribution), the one shuffle is the cell
    * equi-join, AQE handles hot cells. Bounds are nonneg longs (epoch
    * micros); `end > start` is asserted per row — an empty interval
    * overlaps nothing and a caller passing one has swapped columns. */
  def intervalJoin(left: DataFrame, lId: Column, lStart: Column, lEnd: Column,
                   right: DataFrame, rId: Column, rStart: Column, rEnd: Column,
                   cellWidth: Long, maxCellsPerRow: Int = 64): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    require(maxCellsPerRow >= 1, s"maxCellsPerRow must be >= 1, got $maxCellsPerRow")
    def prep(df: DataFrame, id: Column, s0: Column, e0: Column, tag: String) = {
      val (sc, ec) = (s"s_$tag", s"e_$tag")
      df.select(id.cast("long").as(s"id_$tag"),
          s0.cast("long").as(sc), e0.cast("long").as(ec))
        .withColumn(sc, when(assert_true(
            col(sc) >= 0 && col(ec) > col(sc) &&
              expr(s"($ec - 1) div $cellWidth - $sc div $cellWidth") < maxCellsPerRow,
            lit(s"intervalJoin: need 0 <= start < end and span <= " +
              s"$maxCellsPerRow cells of $cellWidth")).isNull,
          col(sc)))
        .withColumn("cell",
          explode(sequence(expr(s"$sc div $cellWidth"), expr(s"($ec - 1) div $cellWidth"))))
    }
    prep(left, lId, lStart, lEnd, "a")
      .join(prep(right, rId, rStart, rEnd, "b"), "cell")
      .filter(col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      .filter(col("cell") === expr(s"greatest(s_a, s_b) div $cellWidth"))
      .select(col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
          .as("overlap_us"))
  }

  // B25: interval-overlap join — even-id event windows vs odd-id event
  // windows (1..97 s durations derived from the id), 60 s cells; the
  // oracle is the brute theta join, so the cell blocking's
  // losslessness and the single-cell dedup are both what the
  // hash-match proves.
  val q25 = Q(
    "q25_interval_join",
    (s, dir) => {
      val iv = eventsUs(Tables(s, dir))
        .select(col("event_id"), col("ts_us").as("s0"),
          (col("ts_us") + (lit(1L) + pmod(col("event_id"), lit(97L))) * lit(1000000L)).as("e0"))
      val a = iv.filter(pmod(col("event_id"), lit(2)) === 0)
      val b = iv.filter(pmod(col("event_id"), lit(2)) === 1)
      intervalJoin(a, col("event_id"), col("s0"), col("e0"),
          b, col("event_id"), col("s0"), col("e0"),
          cellWidth = 60000000L)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH iv AS (SELECT event_id, epoch_us(ts) AS s,
                    epoch_us(ts) + (1 + event_id % 97) * 1000000 AS e
                  FROM events),
      a AS (SELECT * FROM iv WHERE event_id % 2 = 0),
      b AS (SELECT * FROM iv WHERE event_id % 2 = 1)
      SELECT a.event_id AS id_a, b.event_id AS id_b,
             least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
      FROM a JOIN b ON a.s < b.e AND b.s < a.e
      ORDER BY id_a, id_b"""))

  // B15: gap-based sessionization (30-minute inactivity gap).
  val q15 = Q(
    "q15_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      eventsUs(Tables(s, dir))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, lit(1)).otherwise(lit(0)))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions FROM (
        SELECT user_id,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) t
      GROUP BY user_id
      ORDER BY user_id"""))

  // B16: exact distinct (oracle) — approx variant is q16_approx (spec-bounded).
  val q16 = Q(
    "q16_distinct_exact",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("uniq_users"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // B16b: HLL sketch distinct — no SQL oracle (engine-specific sketch);
  // bounds asserted in AnalyticsSpec.
  val q16b = Q(
    "q16_approx_distinct",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_uniq"))
        .orderBy(col("event_type"))
    },
    None)

  // B17: pivot-style conditional aggregation per user.
  val q17 = Q(
    "q17_conditional_pivot",
    (s, dir) => {
      val ev = Tables(s, dir).events
      def n(tpe: String) = count(when(col("event_type") === tpe, lit(1))).as(s"n_$tpe")
      ev.groupBy(col("user_id"))
        .agg(n("purchase"), n("click"), n("view"), n("error"), n("signup"),
             sum(when(col("event_type") === "purchase", col("value")).cast(D)).cast("double").as("purchase_value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  // B18: correlated scalar (per-brand average). NOT a window: p_brand has
  // ~25 values, so `sum(..).over(partitionBy(p_brand))` would shuffle the
  // ENTIRE part table into <=25 WindowExec tasks, each buffering its whole
  // brand partition (no WindowGroupLimit rescue for an unbounded-frame agg).
  // Instead: one map-side-combined groupBy builds the 25-row brand-average
  // frame, which is broadcast back — the big side never shuffles at all.
  // Same decimal-exact math (sum cast to decimal, one double division), so
  // the window-form oracle SQL is value-identical. The join-back is
  // NULL-SAFE (<=>): a window PARTITION BY groups NULL keys into one
  // partition, so a plain equi-join would silently drop NULL-brand rows
  // the window form keeps — latent on TPC-H (brand is non-null) but a
  // real divergence on corpora with missing keys; EqualNullSafe is still
  // a hash-join key, so the broadcast plan is unchanged (spec-pinned).
  val q18 = Q(
    "q18_above_brand_avg",
    (s, dir) => {
      val part = Tables(s, dir).part
      val brandAvg = part.groupBy(col("p_brand"))
        .agg((sum(col("p_retailprice").cast(D)).cast("double") /
              count(lit(1)).cast("double")).as("brand_avg"))
        .withColumnRenamed("p_brand", "b_brand")
      part.join(broadcast(brandAvg), col("p_brand") <=> col("b_brand"))
        .filter(col("p_retailprice") > col("brand_avg"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("p_brand"))
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_above FROM (
        SELECT p_brand, p_retailprice,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) OVER (PARTITION BY p_brand) AS DOUBLE)
            / CAST(COUNT(*) OVER (PARTITION BY p_brand) AS DOUBLE) AS brand_avg
        FROM part) t
      WHERE p_retailprice > brand_avg
      GROUP BY p_brand
      ORDER BY p_brand"""))

  // B19: skew-resilient two-phase salted aggregation — the oracle is the
  // UNSALTED group-by, proving the salting is value-transparent.
  val q19 = Q(
    "q19_salted_agg",
    (s, dir) => {
      Skew.saltedAgg(Tables(s, dir).events,
          col("event_type"), col("value"), col("event_id"))
        .withColumnRenamed("key", "event_type")
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // B20: the SQL surface — Spark executes the IDENTICAL SQL text the
  // DuckDB oracle runs (ANSI subset), through GraftSql temp views.
  private val Q20Sql = """
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        CAST(MIN(o_orderkey) AS BIGINT) AS first_key
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""

  val q20 = Q(
    "q20_sql_api",
    (s, dir) => graft.GraftSql.run(s, dir, Q20Sql),
    Some(Q20Sql))

  // B21: skew-resilient salted JOIN — like q19, salting is
  // value-transparent, so the oracle is the plain join + aggregate.
  val q21 = Q(
    "q21_salted_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val probe = t.orders.select(col("o_custkey").as("custkey"),
        col("o_orderkey"), col("o_totalprice"))
      val build = t.customer.select(col("c_custkey").as("custkey"),
        col("c_mktsegment"))
      Skew.saltedJoin(probe, build, "custkey", col("o_orderkey"), salts = 16)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // B22: full CUBE aggregate — every grouping-set combination of the
  // two keys in ONE pass (Spark plans cube as a single Expand +
  // hash-aggregate: the input is scanned once and each row fans into
  // its 4 grouping sets map-side, so the shuffle carries partial
  // aggregates per (set, key), never the fact rows — the same
  // one-scan shape the rollup (B9) gets, just with 2^n sets instead
  // of n+1). `grouping_id` disambiguates a genuine NULL key from a
  // rolled-up one; Spark and DuckDB agree on the bit order (leftmost
  // cube column = most significant bit — asserted by the oracle
  // hash, not assumed).
  val q22 = Q(
    "q22_cube",
    (s, dir) => {
      Tables(s, dir).orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // B23: exact-parity correlation/covariance — the numeric-profile
  // statistic (feature screening, drift checks) computed WITHOUT the
  // float-accumulation trap: builtin corr()/covar_samp() accumulate
  // doubles, so the result depends on partition count and differs
  // between engines in the low bits. Here every moment (Σx, Σy, Σx²,
  // Σxy, Σy²) is an EXACT decimal sum (quantity fits DECIMAL(9,4),
  // price DECIMAL(18,4); products are exact DECIMAL(27,8), far from
  // 38-digit overflow even at 10¹² rows), cast to double ONCE, and
  // the closed forms are a single fixed IEEE expression tree — the
  // C57/C59 fixed-point discipline applied to second moments. One
  // map-side-combining global aggregate: 5 longs of shuffle per
  // partition, the cheapest possible 100 TB statistic.
  val q23 = Q(
    "q23_stats_corr",
    (s, dir) => {
      val x = col("l_quantity").cast(S)
      val y = col("l_extendedprice").cast(D)
      val agg = Tables(s, dir).lineitem.agg(
        count(lit(1)).as("n_rows"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(x * y).cast("double").as("sxy"),
        sum(y * y).cast("double").as("syy"))
      val n = col("n_rows").cast("double")
      agg.select(col("n_rows"),
          ((col("sxy") - col("sx") * col("sy") / n) / (n - lit(1.0))).as("cov_samp"),
          ((n * col("sxy") - col("sx") * col("sy")) /
            (sqrt(n * col("sxx") - col("sx") * col("sx")) *
              sqrt(n * col("syy") - col("sy") * col("sy")))).as("corr"))
    },
    Some("""
      WITH m AS (
        -- DECIMAL(19,4): width > 18 forces DuckDB's int128 multiply path
        -- (an 18-wide product overflows its int64 fast path). The Spark
        -- side stays at (9,4)/(18,4) — both engines are EXACT, which is
        -- the parity contract; the widths need not match textually.
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy
        FROM lineitem)
      SELECT n_rows,
        (sxy - sx * sy / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1.0) AS cov_samp,
        (CAST(n_rows AS DOUBLE) * sxy - sx * sy) /
          (sqrt(CAST(n_rows AS DOUBLE) * sxx - sx * sx) *
           sqrt(CAST(n_rows AS DOUBLE) * syy - sy * sy)) AS corr
      FROM m"""))

  /** Time-series resample + forward-fill (SURVEY.md §2.B24): aggregate
    * `value` into fixed `bucketUs` buckets per key, materialize the
    * key's FULL bucket calendar between its first and last
    * observation, and forward-fill the gaps with the last observed
    * aggregate — the dashboard/feature-engineering shape ("hourly
    * metric per user, carried forward when silent") a plain groupBy
    * can't produce because missing buckets produce NO row at all.
    * Leading buckets before a key's first observation don't exist by
    * construction; `filled` marks carried values so downstream can
    * tell observation from imputation.
    *
    * Scale shape: one (key, bucket) partial-agg shuffle (decimal-exact
    * value sums — the B1 discipline, so partitioning can't flip low
    * bits), a tiny per-key span agg whose calendar explode is
    * map-side, one (key, bucket) join, and the ffill window — an
    * UnboundedPreceding..CurrentRow RUNNING frame (the q07 class, no
    * whole-partition buffering) partitioned by the high-cardinality
    * key, each partition bounded by that key's own bucket span.
    */
  def resampleFfill(df: DataFrame, key: Column, tsUs: Column, value: Column,
                    bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val keyed = df.select(key.as("k"), tsUs.as("__us"), value.as("__v"))
      .withColumn("bucket", expr(s"__us div CAST($bucketUs AS BIGINT)"))
    val agg = keyed.groupBy(col("k"), col("bucket"))
      .agg(sum(col("__v").cast(D)).cast("double").as("v"))
    val cal = agg.groupBy(col("k"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .select(col("k"), explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val w = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(agg, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
      .withColumn("filled", col("v").isNull && col("v_filled").isNotNull)
  }

  // B24: hourly per-user gap-filled value series over events.
  val q24 = Q(
    "q24_gapfill",
    (s, dir) => {
      resampleFfill(eventsUs(Tables(s, dir)), col("user_id"), col("ts_us"),
          col("value"), bucketUs = 3600L * 1000000L)
        .select(col("k").as("user_id"), col("bucket"), col("v"),
          col("v_filled"), col("filled"))
        .orderBy(col("user_id"), col("bucket"))
    },
    Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value
                 FROM events),
      a AS (SELECT user_id, bucket,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
            FROM e GROUP BY 1, 2),
      s AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
            FROM a GROUP BY 1),
      cal AS (SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM s),
      j AS (SELECT cal.user_id, cal.bucket, a.v
            FROM cal LEFT JOIN a USING (user_id, bucket))
      SELECT user_id, CAST(bucket AS BIGINT) AS bucket, v,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
        (v IS NULL AND last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL) AS filled
      FROM j
      ORDER BY user_id, bucket"""))

  /** B26: ordered conversion funnel (the ClickHouse `windowFunnel` /
    * product-analytics staple) — per user, the earliest view, the
    * earliest click STRICTLY AFTER it, the earliest purchase strictly
    * after that, and the stage depth reached. Strict `>` means a
    * same-microsecond pair never advances a stage (an ordered funnel
    * without order is no funnel). Each stage is one filtered
    * user-keyed min-agg joined to the previous stage's frame — three
    * pruned scans and user-keyed shuffles, all map-side combined;
    * depth-3 users are a subset of depth-2 by construction and the
    * when-chain encodes that. Only users who entered the funnel (a
    * view) appear. */
  /** Per-entity ordered funnel over `stages` (first stage anchors;
    * each later stage is the earliest occurrence STRICTLY AFTER the
    * previous stage's time). Output: (user_id, t_<stage>..., stage_depth);
    * only entities that entered the funnel appear. */
  def funnel(events: DataFrame, user: Column, eventType: Column, tsUs: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    val ev = events.select(user.as("user_id"), eventType.as("__et"),
      tsUs.as("__tu"))
    def tcol(st: String) = s"t_$st"
    val first = ev.filter(col("__et") === stages.head)
      .groupBy(col("user_id")).agg(min(col("__tu")).as(tcol(stages.head)))
    val stageFrames = stages.tail.scanLeft(first) { (prev, st) =>
      val prevT = prev.columns.last
      ev.filter(col("__et") === st)
        .join(prev.select(col("user_id"), col(prevT)), "user_id")
        .filter(col("__tu") > col(prevT))
        .groupBy(col("user_id")).agg(min(col("__tu")).as(tcol(st)))
    }
    val joined = stageFrames.tail.foldLeft(first) { (acc, f) =>
      acc.join(f.select(col("user_id"), col(f.columns.last)),
        Seq("user_id"), "left")
    }
    val depth = stages.tail.map(st =>
        when(col(tcol(st)).isNotNull, lit(1L)).otherwise(lit(0L)))
      .foldLeft(lit(1L): Column)(_ + _)
    joined.select(col("user_id") +: stages.map(st => col(tcol(st))) :+
      depth.as("stage_depth"): _*)
  }

  val q26 = Q(
    "q26_funnel",
    (s, dir) =>
      funnel(eventsUs(Tables(s, dir)), col("user_id"), col("event_type"),
          col("ts_us"), Seq("view", "click", "purchase"))
        .orderBy(col("user_id")),
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
      t1 AS (SELECT user_id, MIN(tu) AS t_view FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
      t2 AS (SELECT e.user_id, MIN(e.tu) AS t_click
             FROM ev e JOIN t1 USING (user_id)
             WHERE e.event_type = 'click' AND e.tu > t1.t_view
             GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, MIN(e.tu) AS t_purchase
             FROM ev e JOIN t2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.tu > t2.t_click
             GROUP BY e.user_id)
      SELECT t1.user_id, t1.t_view, t2.t_click, t3.t_purchase,
             CAST(1 + (CASE WHEN t2.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    + (CASE WHEN t3.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS stage_depth
      FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
      ORDER BY t1.user_id"""))

  /** B27: weekly cohort retention — users bucketed by first-activity
    * epoch-week, counted per (cohort, week offset) they were active
    * in. The `(user, week)` frame is DISTINCT BEFORE the cohort join
    * and the final count is `count(*)` — a `countDistinct` after the
    * join would re-shuffle what the distinct already paid for. Epoch
    * weeks are integer `µs div 604800000000` — no calendar library,
    * no timezone, identical truncation in both engines. */
  val q27 = Q(
    "q27_retention",
    (s, dir) => {
      val ev = eventsUs(Tables(s, dir))
        .select(col("user_id"), expr("ts_us div 604800000000").as("w"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("w")).as("cohort_week"))
      val active = ev.distinct()
      active.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("w") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS w FROM events),
      cohort AS (SELECT user_id, MIN(w) AS cohort_week FROM ev GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, w FROM ev)
      SELECT c.cohort_week, a.w - c.cohort_week AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM active a JOIN cohort c USING (user_id)
      GROUP BY c.cohort_week, week_offset
      ORDER BY c.cohort_week, week_offset"""))

  /** B28: RANGE-frame sliding window — the one window frame the rest
    * of the suite doesn't exercise (q07 runs ROWS/running frames, q24
    * gap-fills): per user, each event also reports how many events
    * that user produced in the PRECEDING HOUR (inclusive), a
    * value-based frame over the canonical epoch-µs time — the
    * sliding-rate view feeding abuse/velocity rules. ROWS frames
    * can't express it (equal event spacing is not guaranteed) and a
    * self-join range predicate would rebuild what WindowExec's
    * sliding range frame already does in one sorted pass per user
    * partition. Counts are exact longs; the frame boundary is integer
    * µs arithmetic — no timezone, no interval type, identical in both
    * engines. */
  val q28 = Q(
    "q28_range_window",
    (s, dir) => {
      val e = Tables(s, dir).events
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"))
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      e.withColumn("n_last_hour", count(lit(1)).over(w))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_last_hour
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      ORDER BY user_id, ts_us, event_id"""))

  /** B29: native session-window aggregation — q15 counts sessions
    * with a custom lag/island pass; this is the same 30-minute-gap
    * semantics expressed as Spark's `session_window` GROUPED
    * AGGREGATION (the form that also runs under Structured Streaming
    * with state eviction — the lag formulation can't), emitting one
    * row per (user, session) with its exact span. `session_window.end`
    * is last-event + gap by Spark's contract, so the LAST EVENT time
    * is end − gap — reported instead of the padded end (a session's
    * observable extent must not depend on the gap parameter).
    * Oracle: the classic gaps-and-islands rewrite (lag → is_new →
    * running island id → per-island min/max/count). */
  val q29 = Q(
    "q29_session_window",
    (s, dir) => {
      val gapUs = 1800000000L
      eventsUs(Tables(s, dir))
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("t"))
        .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          (unix_micros(col("session_window.end")) - gapUs).as("last_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    },
    Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      l AS (SELECT user_id, us,
              CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      g AS (SELECT user_id, us,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                ROWS UNBOUNDED PRECEDING) AS sess
            FROM l)
      SELECT user_id, MIN(us) AS start_us, MAX(us) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, sess
      ORDER BY user_id, start_us"""))

  /** Point-in-interval range join WITHOUT a nested loop (B30) — the
    * degenerate-but-common sibling of [[intervalJoin]] (B25): `points
    * JOIN intervals ON t BETWEEN lo AND hi`, both sides corpus-sized,
    * no equi key, which Spark plans as BroadcastNestedLoopJoin (fine
    * only when one side is tiny) or a cartesian (never fine).
    *
    * Same cell-blocking rewrite as B25, simpler in two ways a
    * dedicated entry point earns: a point lands in exactly ONE cell,
    * so a (point, interval) match is emitted exactly once with no
    * first-cell dedup arithmetic; and both inputs pass through with
    * ALL their columns (B25's kernel reduces to id pairs), so callers
    * join-free carry their payload into the containment result.
    * Bounds are INCLUSIVE (`lo <= t <= hi` — q29's session spans are
    * closed on both ends).
    *
    * Scale: the one shuffle is the cell equi-join; interval blow-up is
    * `span div cellWidth + 1` map-side rows (size `cellWidth` near the
    * median span; `maxCellsPerRow` fail-fasts on a degenerate span
    * instead of exploding); hot cells are ordinary join skew that AQE
    * splits. Work ∝ candidate pairs sharing a cell, not |P|×|I|.
    *
    * Caller contract: disjoint column names across the two frames;
    * `pointCol`/`loCol`/`hiCol` non-negative longs on a shared axis
    * (epoch-µs here); `lo <= hi` per row. */
  def pointInIntervalJoin(points: DataFrame, pointCol: String,
                          intervals: DataFrame, loCol: String, hiCol: String,
                          cellWidth: Long, maxCellsPerRow: Int = 4096): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    require(maxCellsPerRow >= 1, s"maxCellsPerRow must be >= 1, got $maxCellsPerRow")
    val guarded = intervals.withColumn(loCol,
      when(assert_true(
          col(loCol) >= 0 && col(hiCol) >= col(loCol) &&
            expr(s"$hiCol div ${cellWidth}L - $loCol div ${cellWidth}L") < maxCellsPerRow,
          lit(s"pointInIntervalJoin: need 0 <= lo <= hi and span <= " +
            s"$maxCellsPerRow cells of $cellWidth")).isNull,
        col(loCol)))
    val binned = guarded.withColumn("__cell",
      explode(sequence(expr(s"$loCol div ${cellWidth}L"),
                       expr(s"$hiCol div ${cellWidth}L"))))
    points.withColumn("__cell", expr(s"$pointCol div ${cellWidth}L"))
      .join(binned, "__cell")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__cell")
  }

  /** B30: concurrency via range join — for every event, how many
    * OTHER users had an active session (q29's 30-minute-gap spans)
    * covering that instant. The load/abuse signal behind "how busy
    * was the system when this happened", and the suite's only
    * big×big POINT-in-interval join: both sides grow with the corpus
    * and no equi key exists, so it exercises [[pointInIntervalJoin]]'s
    * cell-blocked rewrite (1-hour cells ≈ the session-span scale).
    * Events inside no foreign session keep a 0 row via the left
    * merge-back.
    * Oracle: DuckDB's IEJoin evaluates the BETWEEN predicate
    * directly — same pairs, no binning. */
  val q30 = Q(
    "q30_interval_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val gapUs = 1800000000L
      val ev = eventsUs(t)
        .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val sess = eventsUs(t)
        .select(col("user_id").as("s_user"), timestamp_micros(col("ts_us")).as("t"))
        .groupBy(col("s_user"), session_window(col("t"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("s_user"),
          unix_micros(col("session_window.start")).as("lo_us"),
          (unix_micros(col("session_window.end")) - gapUs).as("hi_us"))
      val counts = pointInIntervalJoin(ev, "ts_us", sess, "lo_us", "hi_us",
          cellWidth = 3600L * 1000000L)
        .filter(col("s_user") =!= col("user_id"))
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_concurrent"))
      ev.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      l AS (SELECT user_id, epoch_us(ts) AS us,
              CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS is_new
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      g AS (SELECT user_id, us,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                ROWS UNBOUNDED PRECEDING) AS sess
            FROM l),
      s AS (SELECT user_id AS s_user, MIN(us) AS lo_us, MAX(us) AS hi_us
            FROM g GROUP BY user_id, sess),
      c AS (SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS n_concurrent
            FROM e JOIN s ON s.s_user <> e.user_id
                         AND e.ts_us BETWEEN s.lo_us AND s.hi_us
            GROUP BY e.event_id)
      SELECT e.event_id, e.user_id, e.ts_us,
             COALESCE(c.n_concurrent, CAST(0 AS BIGINT)) AS n_concurrent
      FROM e LEFT JOIN c ON c.event_id = e.event_id
      ORDER BY e.event_id"""))

  /** B31: contiguous sequence-motif counting (the ClickHouse
    * `sequenceCount`-style product-analytics read): per user, how
    * often the exact ordered run view→click→purchase occurs with NO
    * intervening event — B26's funnel asks "did the user ever
    * progress"; this asks "how many times did the uninterrupted
    * pattern fire", the signal behind bot/abuse run detection and
    * strict conversion paths.
    *
    * The per-user event stream is totally ordered by (ts_us,
    * event_id) — the unique-id tie-break, so collect_list's
    * partition-dependent arrival order can't leak into the result —
    * then joined to one CSV string and counted by LITERAL split
    * (split on a metacharacter-free pattern is engine-identical;
    * regex dialects are not). Event-type names are whole comma-
    * separated tokens, so a motif match can't start mid-token.
    *
    * Scale: one per-user shuffle of (ts, id, type) triples with
    * map-side partial collect; per-user state is that user's OWN
    * event count (the per-entity bound every sessionize/funnel
    * operator already carries), never corpus-sized. */
  val q31 = Q(
    "q31_sequence_motif",
    (s, dir) => {
      val motif = "view,click,purchase"
      eventsUs(Tables(s, dir))
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          array_join(transform(
            array_sort(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ",").as("seq"))
        .select(col("user_id"), col("n_events"),
          (size(split(col("seq"), motif, -1)) - 1).cast("long").as("n_motifs"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
                 FROM events WHERE user_id IS NOT NULL),
      s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
              string_agg(event_type, ',' ORDER BY us, event_id) AS seq
            FROM e GROUP BY user_id)
      SELECT user_id, n_events,
        CAST(len(string_split(seq, 'view,click,purchase')) - 1 AS BIGINT)
          AS n_motifs
      FROM s ORDER BY user_id"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q10b, q21,
    q11, q12, q13, q13b, q13c, q14, q15, q16, q16b, q17, q18, q19, q20, q22, q23,
    q24, q25, q26, q27, q28, q29, q30, q31)
}
