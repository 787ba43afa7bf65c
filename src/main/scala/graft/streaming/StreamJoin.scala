package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream equi+time-range join (SURVEY.md §2.A16) —
  * the attribution shape: every RIGHT-stream event (e.g. a purchase)
  * joined to the LEFT-stream events of the same key (e.g. that user's
  * clicks) that happened in the PRECEDING `windowSeconds`. This is the
  * one join family the batch surface can't stand in for on unbounded
  * inputs: both sides grow forever, so correctness depends on Spark
  * buffering each side's rows ONLY until the other side's watermark
  * proves no more matches can arrive.
  *
  * State-bound contract (the 100 TB story): with watermarks on BOTH
  * sides and the time-range predicate tying the two event times, Spark
  * derives a state eviction horizon — left rows are dropped once
  * `leftTime < rightWatermark − windowSeconds`, right rows once their
  * own watermark passes. Without the range predicate the state is
  * unbounded and the query still "works" on a demo while leaking
  * memory on a real stream; this helper makes the predicate
  * structurally mandatory.
  *
  * Inner join only here: left/right outer stream-stream joins emit
  * NULL-padded rows at watermark expiry with the same state bound —
  * the `joinType` parameter exposes them where the pipeline needs
  * "views that converted to nothing".
  *
  * Caller contract: `left`/`right` are STREAMING frames with disjoint
  * column names apart from the key; `leftTime`/`rightTime` are their
  * event-time TIMESTAMP columns (each side's watermark column).
  */
object StreamJoin {
  def withinWindow(left: DataFrame, leftKey: Column, leftTime: Column,
                   right: DataFrame, rightKey: Column, rightTime: Column,
                   windowSeconds: Long,
                   leftDelay: String = "1 minute",
                   rightDelay: String = "1 minute",
                   joinType: String = "inner"): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val l = left.withColumn("__lt", leftTime).withColumn("__lk", leftKey)
      .withWatermark("__lt", leftDelay)
    val r = right.withColumn("__rt", rightTime).withColumn("__rk", rightKey)
      .withWatermark("__rt", rightDelay)
    l.join(r,
        col("__lk") === col("__rk") &&
          col("__lt") <= col("__rt") &&
          col("__lt") >= col("__rt") - expr(s"INTERVAL $windowSeconds SECONDS"),
        joinType)
      .drop("__lk", "__rk")
      .withColumnRenamed("__lt", "left_time")
      .withColumnRenamed("__rt", "right_time")
  }
}
