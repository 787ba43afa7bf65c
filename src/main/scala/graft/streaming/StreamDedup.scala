package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (SURVEY.md §2.C18) — the streaming
  * face of `Dedup.exactDedup`: drop records whose normalized-content
  * hash has already been seen. Both variants keep only the md5 key in
  * state — never the document payload — so state size is bounded by
  * distinct-key count (bounded variant: keys inside the watermark
  * horizon), not corpus bytes. Exception: NULL-text records each
  * carry a unique key (the singleton rule below), so state grows
  * with their COUNT — watermark-bounded in [[withinWatermark]];
  * in [[unbounded]], bounded only by the backfill's size, so a
  * null-heavy unbounded stream should filter them upstream.
  *
  * [[withinWatermark]] is the scale path: Spark evicts state for keys
  * older than the event-time watermark, so a continuous ingest run has
  * bounded state; dups separated by more than `delay` are NOT caught —
  * that is the documented tradeoff, and batch `Dedup.exactDedup` over
  * the landed corpus is the backstop. [[unbounded]] keeps state
  * forever (exact across the whole stream) for finite backfills.
  */
object StreamDedup {

  /** The batch operator's normalization, verbatim (Dedup.exactGroups),
    * so stream and batch agree on what is a duplicate. NULL text maps
    * to a per-record unique key instead of NULL: dropDuplicates treats
    * NULL keys as equal, which would silently swallow every text-less
    * record after the first — the batch side's NULL-singleton rule
    * (absence of content is not equality of content), kept in sync.
    * The unique key is a uuid, so a replayed null-text record is NOT
    * deduped against its own earlier delivery — acceptable: such
    * records carry no content to duplicate, and the batch exactDedup
    * backstop applies the same singleton rule downstream. */
  def contentKey(text: Column): Column =
    coalesce(md5(graft.functions.TextFunctions.normalizeText(text)),
      concat(lit("__null__"), uuid()))

  def withinWatermark(df: DataFrame, ts: Column, text: Column,
                      delay: String): DataFrame =
    df.withColumn("content_hash", contentKey(text))
      .withColumn("event_ts", ts)
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")

  def unbounded(df: DataFrame, text: Column): DataFrame =
    df.withColumn("content_hash", contentKey(text))
      .dropDuplicates("content_hash")
}
