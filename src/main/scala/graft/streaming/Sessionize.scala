package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization over an event-time stream
  * (SURVEY.md §2.B15 streaming path): `flatMapGroupsWithState` with an
  * event-time timeout — per-user state is one open session (O(1) per
  * key), closed sessions emit either when a later in-batch event
  * overshoots the gap or when the watermark passes sessionEnd+gap.
  *
  * This is the custom-state API the builder prompt calls out for
  * streams Spark's windowing can't express: session windows keyed by
  * activity gaps, not fixed boundaries. (Batch-mode sessionization with
  * a DuckDB oracle is q15_sessionize; this operator is its unbounded
  * equivalent with watermark-bounded state.)
  */
object Sessionize {

  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class UserSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** events: (user_id BIGINT, ts TIMESTAMP). Emits closed sessions. */
  def sessions(events: DataFrame, gapSeconds: Long,
               watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapUs) _)
  }

  private def process(gapUs: Long)(
      userId: Long,
      events: Iterator[(Long, Timestamp)],
      state: GroupState[OpenSession]): Iterator[UserSession] = {

    def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events → session is final
      val s = state.get
      state.remove()
      Iterator.single(UserSession(userId, s.startUs, s.lastUs, s.n))
    } else {
      val sorted = events.map(e => toUs(e._2)).toArray.sorted
      val closed = Seq.newBuilder[UserSession]
      var cur = state.getOption
      sorted.foreach { t =>
        cur match {
          case Some(s) if t - s.lastUs > gapUs =>
            closed += UserSession(userId, s.startUs, s.lastUs, s.n)
            cur = Some(OpenSession(t, t, 1))
          case Some(s) =>
            // within-watermark stragglers may land before the open
            // session's start as well as inside it
            cur = Some(OpenSession(math.min(s.startUs, t), math.max(s.lastUs, t), s.n + 1))
          case None =>
            cur = Some(OpenSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // fire once the watermark passes the gap after the last event
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
      }
      closed.result().iterator
    }
  }
}
