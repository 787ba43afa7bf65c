package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.concurrent.Signaler
import org.scalatest.time.{Seconds, Span}

/** Execution smoke over the WHOLE registry: every registered query
  * must actually RUN to completion at sf0.001, inside a hard
  * per-query deadline.
  *
  * This is the structural gate round 9 was missing: qgraph_coreness
  * was registered at the very end of the round and never executed
  * before the driver ran it — its checkpoint loop hung the planner
  * (compounding size estimates) and zeroed the round's entire
  * correctness and bench records. Plan-only audits don't catch that
  * class (PlanAuditSpec builds the same DataFrames but never runs
  * them), and per-operator specs only cover queries someone
  * remembered to spec. Here, REGISTERING a query is what enrolls it:
  * a hang fails its own named test after the deadline instead of
  * wedging the suite, and an execution-time exception surfaces with
  * the query's name.
  *
  * `ThreadSignaler` interrupts the test thread on timeout; a
  * non-interruptible hang (tight native/BigInteger loops) still
  * fails the test — the abandoned thread costs one core until the
  * JVM exits, which is exactly the Verify/Bench watchdog trade. */
class RegistrySmokeSpec extends AnyFunSuite with TimeLimits {
  import SparkTest._
  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001 within its deadline") {
      failAfter(Span(120, Seconds)) {
        val rows = fn(spark, sf).collect()
        assert(rows != null)
        // clear per-query persisted frames so 160+ sequential
        // executions don't accumulate cached storage on local[4]
        spark.catalog.clearCache()
      }
    }
  }
}
