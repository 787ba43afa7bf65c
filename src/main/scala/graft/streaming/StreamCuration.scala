package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming lift of the batch curation front-end (SURVEY.md §2.C72) —
  * the C67 recipe's pre-dedup stages applied AT INGEST, so a
  * continuously arriving crawl lands already normalized, gated,
  * scrubbed and (within the watermark horizon) deduplicated instead
  * of waiting for the next batch pass:
  *
  *   NFC normalize → encoding gate → Gopher quality gate → PII scrub
  *   → streaming exact dedup
  *
  * Every pre-dedup stage is a STATELESS column expression — the same
  * shared functions the batch pipeline and its green oracles use
  * ([[TextFunctions.nfcNormalize]], [[TextFunctions.isCleanText]],
  * [[TextFunctions.gopherGate]]'s predicates, [[TextFunctions
  * .redactPii]]), so stream/batch parity holds BY CONSTRUCTION (one
  * definition, two execution modes; StreamingSpec proves it row for
  * row), and the whole prefix executes as one codegen map stage per
  * micro-batch — no state, no shuffle. The only stateful stage is the
  * C18 dedup tail: key-only state, watermark-bounded.
  *
  * Stage ORDER is the batch contract, kept for the same reasons:
  * normalization precedes hashing (composed/decomposed spellings must
  * collapse), the gates see the normalized-but-unscrubbed text (a
  * redaction placeholder must not rescue a doc's token stats), and
  * the dedup key is the DELIVERED (scrubbed) text — two docs equal
  * after redaction are the same training document.
  */
object StreamCuration {

  final case class GateConfig(
      minTokens: Int, maxTokens: Int,
      minMeanLen: Int, maxMeanLen: Int,
      minStopwords: Int = 2)

  /** The shared stateless prefix: returns `df` with `clean` (the
    * delivered text) appended, rows failing either gate dropped.
    * Batch callers can use this directly — it is mode-agnostic.
    * The gate's internal measure/flag columns are DROPPED from the
    * output: the delivered schema is the input columns plus `clean`,
    * not ten per-row diagnostics written to the sink every
    * micro-batch (a caller who wants the flags calls
    * [[TextFunctions.gopherGate]] directly). Fails fast if the input
    * already carries `clean` or `__txt` — silently replacing an
    * upstream cleaning step's column is the bug class gopherGate's
    * own reserved-name guard exists for. */
  def gateAndScrub(df: DataFrame, text: Column, gate: GateConfig): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("clean", "__txt"))
    require(clash.isEmpty,
      s"gateAndScrub writes reserved columns (clean, __txt); " +
        s"input already carries: ${clash.toSeq.sorted.mkString(", ")} — drop or rename them first")
    val normed = df.withColumn("__txt", TextFunctions.nfcNormalize(text))
      .filter(TextFunctions.isCleanText(col("__txt")))
    val gated = TextFunctions.gopherGate(normed, col("__txt"),
        gate.minTokens, gate.maxTokens, gate.minMeanLen, gate.maxMeanLen,
        gate.minStopwords)
      .filter(col("passes"))
      .withColumn("clean", TextFunctions.redactPii(col("__txt")))
    gated.select(df.columns.toIndexedSeq.map(col) :+ col("clean"): _*)
  }

  /** Full streaming preprocess: gate + scrub, then streaming exact
    * dedup on the delivered text. `dedupWithin = Some(delay)` is the
    * continuous-ingest path (key state evicted past the watermark;
    * batch exactDedup over the landed corpus is the backstop, the C18
    * contract); `None` keeps exact state for finite backfills. */
  def preprocess(df: DataFrame, ts: Column, text: Column, gate: GateConfig,
                 dedupWithin: Option[String] = None): DataFrame = {
    val clean = gateAndScrub(df, text, gate)
    dedupWithin match {
      case Some(delay) => StreamDedup.withinWatermark(clean, ts, col("clean"), delay)
      case None => StreamDedup.unbounded(clean, col("clean"))
    }
  }
}
