package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

class LayoutSpec extends AnyFunSuite {
  import SparkTest._

  test("co-bucketed tables join with zero exchanges in the plan") {
    val t = Tables(spark, sf)
    Layout.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "g_orders_bucketed", buckets = 4, key = "o_orderkey")
    Layout.writeBucketed(
      t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
      "g_lineitem_bucketed", buckets = 4, key = "l_orderkey")

    // disable broadcast so the join planner must pick shuffle-or-bucket
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("g_orders_bucketed")
        .join(spark.table("g_lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // every lineitem matches exactly one order → row count is preserved
      assert(joined.count() == t.lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key reuses the layout partitioning") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("g_lineitem_bucketed")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"group-by on the bucket key must not shuffle:\n$plan")
      assert(agg.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
