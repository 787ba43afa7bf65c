package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide physical-plan guard: no registered query may plan a
  * CartesianProduct or an unbounded BroadcastNestedLoopJoin — the two
  * shapes that silently turn into O(n·m) compares at cluster scale.
  * This generalizes DedupSpec's per-operator assertion to the whole
  * query surface, so a future edit that degrades a join to a
  * cartesian fails CI, not the 100 TB run.
  *
  * Allowlist = joins that are BNLJ by construction but provably
  * bounded: broadcasting a 1-row aggregate (a scalar riding along) or
  * a non-equi range predicate against a frame that is small by
  * definition. Every entry must say WHY it is bounded.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTest._

  private val bnljAllowed: Map[String, String] = Map(
    "qtext_tfidf" -> "crossJoin(broadcast(n)) where n is a 1-row corpus count",
    "qann_brute_topk" -> ("brute-force ANN IS all-pairs by definition; the " +
      "bounded side (the query set) is broadcast so the corpus never shuffles — " +
      "the scale path is qann_lsh_bucketed"),
    "qann_ivf" -> ("the crossJoin broadcasts the CENTROID frame — one row per " +
      "cell, bounded by nlist, never corpus-sized"),
    "qann_ivf_trained" -> ("same bounded centroid broadcast, in both the Lloyd " +
      "train step and the search"),
    "qann_ivf_trained2" -> ("same bounded centroid broadcast, once per Lloyd " +
      "iteration and once in the search")
  )

  test("no registered query plans a cartesian or unbounded nested-loop join") {
    // COVERAGE NOTE: a localCheckpoint boundary truncates the visible
    // plan, so the cluster queries (qdedup_clusters/qdedup_apply) show
    // only their post-checkpoint tail here. Their upstream pair
    // pipeline is audited twice anyway: via qdedup_simhash (same plan,
    // un-checkpointed) and explicitly below.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cart = if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct") else None
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
        Some(s"$name: BroadcastNestedLoopJoin") else None
      cart.toSeq ++ bnlj.toSeq
    }
    assert(offenders.isEmpty, s"unbounded join shapes planned:\n${offenders.mkString("\n")}")
  }

  test("the checkpoint-hidden cluster pair pipeline is itself clean") {
    import org.apache.spark.sql.functions.col
    val t = graft.sources.Tables(spark, sf)
    val pairs = graft.operators.Dedup.simhashPairs(
      t.documents, col("doc_id"), col("text"), maxDist = 3)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cluster pair generation plans an unbounded join:\n$plan")
  }
}
