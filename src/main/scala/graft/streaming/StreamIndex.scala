package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming index maintenance — the INGEST path of the pay-once ANN
  * index (SURVEY.md §2.C154, streaming side): embeddings arrive
  * continuously (a crawler's encoder output, an ingestion pipeline's
  * embedding stage), and the binary-quantized codes table must grow
  * with them WITHOUT retraining or re-encoding the existing corpus.
  */
object StreamIndex {

  /** Release a query's pinned frozen-artifact frames when it
    * terminates. Every append/monitor start pins its stats/centroid
    * frame once per query (not per micro-batch) — but AvailableNow
    * queries are typically restarted on a schedule, and without this
    * each restart would strand one more small cached relation in the
    * driver's cache for the app lifetime. A listener keyed on the
    * RUN id (unique per run — the query id is checkpoint-stable, so a
    * delayed termination event from the PREVIOUS run on the async
    * listener bus would match the next restart's listener and
    * unpersist its pinned frames mid-run) unpersists on termination
    * and deregisters itself; the isActive re-check closes the race
    * where a tiny AvailableNow run terminates before the listener
    * lands (double-unpersist is a no-op). */
  private[streaming] def unpersistOnTermination(spark: SparkSession,
                                                query: StreamingQuery,
                                                pinned: Seq[DataFrame]): StreamingQuery = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.runId == query.runId) {
          pinned.foreach(_.unpersist(blocking = false))
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    if (!query.isActive) {
      pinned.foreach(_.unpersist(blocking = false))
      spark.streams.removeListener(listener)
    }
    query
  }

  /** Tail a directory of embedding parquet files and append each
    * micro-batch's 1-bit codes to a partitioned codes table.
    *
    * Contract stack (each leg proven elsewhere, composed here):
    *  - Encoding runs against the FROZEN stats table at `statsDir` —
    *    `bqEncode` under frozen stats IS the append path (the BQ
    *    append-parity law: re-encoding existing rows reproduces their
    *    codes byte-for-byte, and a grown table under a full shortlist
    *    equals bruteTopK over the union).
    *  - Each micro-batch OVERWRITES its own `batch=<id>` partition of
    *    `codesDir` (the monitor plumbing's replay-idempotence
    *    pattern): a replayed batch — rename-failure retry, or a crash
    *    between the write and the commit log — replaces its own
    *    output instead of duplicating codes.
    *  - Readers take `spark.read.parquet(codesDir)` as the
    *    `(vec_id, codes)` table of `bqTopKAgainstIndex`; the
    *    discovered `batch` partition column is dropped by selection.
    *
    * Scale shape: per batch, one codegen map pass over the new rows
    * against a bounded 1-row stats broadcast; only ⌈d/32⌉ packed
    * longs per vector land on disk — the stream writes 32× fewer
    * bytes than the raw float32 vectors it consumes, and nothing
    * corpus-sized is ever read back. Drift discipline: frozen
    * thresholds slowly stale as the embedding distribution moves —
    * run [[startBqDriftMonitor]] beside this append and
    * retrain+re-encode as a batch job when it alarms (the
    * standard production split: cheap streaming appends, rare
    * deliberate rebuilds). The retrain's four rewritten artifacts
    * publish atomically via
    * [[graft.sources.Layout.publishIndexVersion]] — readers flip
    * generations whole, never mixed — and append legs restart
    * against the new generation's tables. */
  /** Tombstone guard for the append legs: a takedown
    * ([[graft.operators.Similarity.indexRemove]]) cleans the BATCH
    * tables, but a late-arriving or replayed stream file can
    * re-encode the removed id — deleted content resurrected by the
    * ingest path. Each micro-batch anti-joins the tombstone id table
    * before encoding (the same keyed-anti-join primitive as the
    * remove itself); readers of the still-growing streamed dir apply
    * the SAME guard by passing `tombstones = Some(read(tombstonesDir))`
    * to the `AgainstIndex` search they run (one argument, not caller
    * folklore — search-with-tombstones ≡ search-over-removed-index is
    * spec-pinned per family) until the next compaction materializes
    * the pruned table. The frame is
    * read once per query start and pinned like the frozen artifacts —
    * AvailableNow restarts (the scheduled-ingest shape) pick up new
    * tombstones at each start. */
  private def tombstoneGuard(spark: SparkSession, id: String,
                             tombstonesDir: Option[String])
      : (DataFrame => DataFrame, Seq[DataFrame]) =
    tombstonesDir match {
      case Some(dir) =>
        val ts = spark.read.parquet(dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // mirror Similarity.indexRemove exactly: cast the tombstone ids
        // to the batch id column's type and distinct them — a tombstone
        // table written with a different id type (int vs long, string
        // ids) must behave like the batch-side remove it guards for
        val f: DataFrame => DataFrame = batch =>
          batch.join(
            ts.select(col(ts.columns.head)
              .cast(batch.schema(id).dataType).as(id)).distinct(),
            Seq(id), "left_anti")
        (f, Seq(ts))
      case None => (identity[DataFrame] _, Nil)
    }

  def startBqIndexAppend(spark: SparkSession, inputDir: String,
                         schema: StructType, id: String, vec: String,
                         checkpointDir: String, statsDir: String,
                         codesDir: String,
                         tombstonesDir: Option[String] = None): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    // the frozen stats are d rows, read ONCE per query start and
    // pinned (the neardup_screen pattern) — not re-read per micro-batch
    val stats = spark.read.parquet(statsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (guard, guardPinned) = tombstoneGuard(spark, id, tombstonesDir)
    unpersistOnTermination(spark,
      spark.readStream.schema(schema).parquet(inputDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Similarity.bqEncode(guard(batch), col(id), col(vec), stats)
            .write.mode("overwrite")
            .parquet(codesDir.stripSuffix("/") + s"/batch=$batchId")
        }
        .start(),
      stats +: guardPinned)
  }

  /** Streaming IVF CELL maintenance (C154i — the cells half of the
    * composed index's append story): [[startBqIndexAppend]] grows the
    * codes table, but the cell-bounded compositions (IVF+BQ, IVF+PQ)
    * candidate-join on the CELLS table too — a streamed vector with
    * codes but no cell is silently invisible to every composed search.
    * This leg assigns each micro-batch's vectors to their nearest
    * FROZEN centroid
    * ([[graft.operators.Similarity.ivfAssignAgainstIndex]] — the
    * build's own argmax definition, so a streamed vector lands in
    * exactly the cell the batch build would have chosen) and appends
    * `(vec_id, cell)` rows to `cellsDir/batch=<id>` with the same
    * overwrite-mode replay idempotence as the codes leg. Run BOTH legs
    * over the same input stream (separate checkpoints) and the full
    * four-artifact composed search keeps seeing every appended vector
    * (spec-pinned: full probe + full shortlist over the grown tables ≡
    * bruteTopK over the union). Per batch: one codegen scoring pass
    * against the bounded nlist-row centroid broadcast; only (long,
    * long) rows land on disk. Centroid drift is the same retrain
    * discipline as the stats table — [[startBqDriftMonitor]] alarms
    * cover both frozen artifacts (they stale together: both are
    * corpus-distribution summaries). */
  def startIvfCellAppend(spark: SparkSession, inputDir: String,
                         schema: StructType, id: String, vec: String,
                         checkpointDir: String, centroidsDir: String,
                         cellsDir: String,
                         tombstonesDir: Option[String] = None): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    // the frozen centroids are nlist rows, read ONCE per query start
    // and pinned (the startBqIndexAppend discipline)
    val cents = spark.read.parquet(centroidsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (guard, guardPinned) = tombstoneGuard(spark, id, tombstonesDir)
    unpersistOnTermination(spark,
      spark.readStream.schema(schema).parquet(inputDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.Similarity
            .ivfAssignAgainstIndex(guard(batch), col(id), col(vec), cents)
            .write.mode("overwrite")
            .parquet(cellsDir.stripSuffix("/") + s"/batch=$batchId")
        }
        .start(),
      cents +: guardPinned)
  }

  /** COMPOSED index append (C154i's single-stream form): grow the
    * codes AND cells tables from ONE stream under ONE checkpoint. Two
    * separate legs ([[startBqIndexAppend]] + [[startIvfCellAppend]])
    * are each correct, but their checkpoints advance independently —
    * one leg can commit batches the other hasn't processed, and during
    * that lag a vector sits in codes without a cell (or vice versa)
    * and is invisible to the composed search's candidate⋈codes join.
    * Here both artifacts are written inside the SAME micro-batch
    * before its commit, so at every committed offset the two tables
    * cover exactly the same vectors; a crash between the two writes
    * leaves an uncommitted batch whose replay overwrites BOTH
    * `batch=<id>` partitions (the idempotence pattern heals the
    * half-written window). The batch is pinned across its two
    * consumers — without the persist each write would re-read the
    * input file separately. */
  def startComposedIndexAppend(spark: SparkSession, inputDir: String,
                               schema: StructType, id: String, vec: String,
                               checkpointDir: String, statsDir: String,
                               centroidsDir: String, codesDir: String,
                               cellsDir: String,
                               tombstonesDir: Option[String] = None): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val stats = spark.read.parquet(statsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = spark.read.parquet(centroidsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (guard, guardPinned) = tombstoneGuard(spark, id, tombstonesDir)
    unpersistOnTermination(spark,
      spark.readStream.schema(schema).parquet(inputDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // the guard runs BEFORE the pin so both artifact writes see
          // the same tombstone-filtered rows
          val pinned = guard(batch).persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            graft.operators.Similarity.bqEncode(pinned, col(id), col(vec), stats)
              .write.mode("overwrite")
              .parquet(codesDir.stripSuffix("/") + s"/batch=$batchId")
            graft.operators.Similarity
              .ivfAssignAgainstIndex(pinned, col(id), col(vec), cents)
              .write.mode("overwrite")
              .parquet(cellsDir.stripSuffix("/") + s"/batch=$batchId")
          } finally pinned.unpersist(blocking = false): Unit
        }
        .start(),
      Seq(stats, cents) ++ guardPinned)
  }

  /** Streaming IVFADC maintenance (C161 — [[startComposedIndexAppend]]
    * for the RESIDUAL-PQ family, the index the retrain loop actually
    * publishes): each micro-batch is assigned and residual-encoded
    * against the FROZEN centroids + codebook via [[graft.operators
    * .Similarity.ivfPqResAppend]]'s own per-row functions (the C156
    * append-parity law: appending the index's rows reproduces its
    * tables exactly), and `(vec_id, cell)` + `(vec_id, codes)` land
    * in lockstep `batch=<id>` overwrite partitions under ONE
    * checkpoint — at every committed offset the two tables cover
    * exactly the same vectors, so a streamed vector is never visible
    * to the candidate join without its code (or vice versa). The
    * internal assignment pin is released per micro-batch
    * ([[graft.operators.Similarity.ivfPqResAppendPinned]]), not
    * stranded per batch for the app lifetime. Readers of the
    * still-growing dirs pass `tombstones` to
    * `ivfPqResTopKAgainstIndex` (the shared reader-guard argument);
    * compaction + atomic re-publish is [[compactStreamedIndex]] with
    * the frozen centroids/books riding along — the full retrain-loop
    * lifecycle (C158's publish leg) now has a streaming ingest edge
    * for its own index family, not just the BQ one. Per batch:
    * |batch|·nlist map-side centroid scores against the bounded
    * nlist-row broadcast plus one m·ksub-bounded encode; only (long,
    * long) and (long, array<int>) rows land on disk. */
  def startIvfPqResIndexAppend(spark: SparkSession, inputDir: String,
                               schema: StructType, id: String, vec: String,
                               checkpointDir: String, centroidsDir: String,
                               booksDir: String, cellsDir: String,
                               codesDir: String, m: Int, ksub: Int,
                               tombstonesDir: Option[String] = None): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val cents = spark.read.parquet(centroidsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books = spark.read.parquet(booksDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (guard, guardPinned) = tombstoneGuard(spark, id, tombstonesDir)
    unpersistOnTermination(spark,
      spark.readStream.schema(schema).parquet(inputDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (cells, codes, pinned) =
            graft.operators.Similarity.ivfPqResAppendPinned(
              cents, books, guard(batch), col(id), col(vec), m, ksub)
          try {
            cells.write.mode("overwrite")
              .parquet(cellsDir.stripSuffix("/") + s"/batch=$batchId")
            codes.write.mode("overwrite")
              .parquet(codesDir.stripSuffix("/") + s"/batch=$batchId")
          } finally pinned.unpersist(blocking = false): Unit
        }
        .start(),
      Seq(cents, books) ++ guardPinned)
  }

  /** Streaming BM25 TEXT-index maintenance (C160 — the retrieval twin
    * of the ANN append legs, closing the one streaming-maintenance
    * asymmetry left: embeddings had three streamed ingest paths while
    * the text index could only grow by batch [[graft.functions
    * .Keywords.textIndexAppend]] calls): tail a documents parquet
    * stream and land each micro-batch's index contribution as
    * PER-BATCH PARTIAL frames — `postings/batch=<id>`,
    * `docs/batch=<id>`, `terms/batch=<id>` (the batch's own per-term
    * df/ctf), `stats/batch=<id>` (the batch's 1-row count/token mass).
    *
    * Why partials instead of merged frames: df/ctf/avgdl are not
    * frozen artifacts — every append changes them, and a streamed
    * read-merge-rewrite of a vocabulary table per micro-batch is the
    * read-modify-write cycle streaming ingest exists to avoid. But
    * df/ctf/stats merge by PURE ADDITION ([[graft.functions.Keywords
    * .textIndexAppend]]'s outer-merge is associative+commutative), so
    * the partials ARE the index: [[readStreamedTextIndex]] folds them
    * with one vocab-bounded `groupBy(term).sum` and a #batches-row
    * stats sum — work proportional to the vocabulary, never the
    * corpus — and postings/docs union by partition discovery, exactly
    * the shape the batch append produces under term-bucketed storage.
    *
    * Contract stack (each leg proven elsewhere, composed here):
    *  - Per batch, ONE tokenize pass ([[graft.functions.Keywords
    *    .docTermCounts]] cached for the four derived writes, and
    *    unpersisted per batch — not stranded for the app lifetime);
    *    the frame definitions are [[graft.functions.Keywords
    *    .textIndexFromPostings]]'s own, so the streamed partials
    *    cannot drift from the batch build's.
    *  - Each micro-batch OVERWRITES its own `batch=<id>` partitions
    *    (replay idempotence — a replayed batch replaces its own
    *    output instead of double-counting df/ctf mass).
    *  - Tombstone guard at ingest: a late or replayed file must not
    *    resurrect a taken-down doc's postings (same keyed anti-join
    *    as the ANN legs). Readers of the still-growing dir pass
    *    `tombstones` to [[readStreamedTextIndex]], which routes the
    *    guard through [[graft.functions.Keywords.textIndexRemove]] —
    *    for text a takedown must also subtract df/ctf/stats mass, so
    *    the guard IS the remove primitive, not a bare filter (the
    *    same reason the text `AgainstIndex` searches take no
    *    tombstone argument).
    *  - New-ids-only caller contract, inherited from
    *    [[graft.functions.Keywords.textIndexAppend]]: a re-crawled
    *    id must be tombstoned (or compacted out) first — streamed
    *    partials are additive, so a re-sent id would double-count.
    *
    * Scale shape: per batch, one explode+aggregate over the new docs
    * only; nothing corpus-sized is read back, the vocabulary merge is
    * deferred to read time where it costs one bounded aggregation.
    * Compaction endgame: [[compactStreamedIndex]]'s discipline
    * applies frame-by-frame (anti-join tombstones via
    * [[graft.functions.Keywords.textIndexRemove]], drop the `batch`
    * column, rewrite to target-size files, publish as one
    * generation). */
  def startTextIndexAppend(spark: SparkSession, inputDir: String,
                           schema: StructType, id: String, text: String,
                           checkpointDir: String, indexDir: String,
                           tombstonesDir: Option[String] = None): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val base = indexDir.stripSuffix("/")
    val (guard, guardPinned) = tombstoneGuard(spark, id, tombstonesDir)
    unpersistOnTermination(spark,
      spark.readStream.schema(schema).parquet(inputDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // one tokenize pass per batch; the cached tf frame feeds all
          // four derived writes and is released before the next batch
          val tf = graft.functions.Keywords.docTermCounts(
            guard(batch), col(id), col(text))
          try {
            val ix = graft.functions.Keywords.textIndexFromPostings(tf)
            ix.postings.write.mode("overwrite")
              .parquet(s"$base/postings/batch=$batchId")
            ix.terms.write.mode("overwrite")
              .parquet(s"$base/terms/batch=$batchId")
            ix.docs.write.mode("overwrite")
              .parquet(s"$base/docs/batch=$batchId")
            ix.stats.write.mode("overwrite")
              .parquet(s"$base/stats/batch=$batchId")
          } finally tf.unpersist(blocking = false): Unit
        }
        .start(),
      guardPinned)
  }

  /** Assemble a [[graft.functions.Keywords.TextIndex]] from a
    * [[startTextIndexAppend]] output tree: postings/docs by partition
    * discovery (the `batch` bookkeeping column dropped by selection),
    * per-term df/ctf partials folded with one vocab-bounded sum,
    * per-batch stats rows folded to the 1-row corpus stats (coalesced
    * so an all-empty stream still yields (0, 0), matching the batch
    * build's empty-corpus contract). With `tombstones`, the assembled
    * index routes through [[graft.functions.Keywords
    * .textIndexRemove]] — df/ctf/stats mass subtracted, not merely
    * filtered — so search over a guarded streamed read ≡ search over
    * the rebuilt-without corpus (spec-pinned). */
  def readStreamedTextIndex(spark: SparkSession, indexDir: String,
                            tombstones: Option[DataFrame] = None)
      : graft.functions.Keywords.TextIndex = {
    val base = indexDir.stripSuffix("/")
    val ix = graft.functions.Keywords.TextIndex(
      postings = spark.read.parquet(s"$base/postings")
        .select(col("doc_id"), col("term"), col("tf")),
      terms = spark.read.parquet(s"$base/terms")
        .groupBy(col("term"))
        .agg(sum(col("df")).as("df"), sum(col("ctf")).as("ctf")),
      docs = spark.read.parquet(s"$base/docs")
        .select(col("doc_id"), col("dl")),
      stats = spark.read.parquet(s"$base/stats")
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("total_tokens")), lit(0L)).as("total_tokens")))
    tombstones.map(ts => graft.functions.Keywords.textIndexRemove(ix, ts))
      .getOrElse(ix)
  }

  /** Streaming IVF drift monitor (C154j — [[startIvfCellAppend]]'s
    * retrain trigger, the coarse-quantizer twin of
    * [[startBqDriftMonitor]]): accumulate per-CELL occupancy partial
    * counts of the incoming vectors under the frozen centroids
    * (`Similarity.ivfCellBuckets` — the build's own argmax, so the
    * monitored occupancy is exactly what lands in the cells table) and
    * PSI them per micro-batch against the training corpus's pinned
    * occupancy at `refCountsDir`
    * (`Similarity.ivfCellCounts(trainingCorpus, id, vec, centroids)`
    * written to parquet). Mass collapsing into few cells is the
    * composed search's recall-and-skew killer — probes miss moved
    * vectors and the hot cells' candidate lists balloon — so alarm on
    * the same C152 folklore and retrain+re-encode as a batch job
    * (publish the rewritten artifacts atomically via
    * [[graft.sources.Layout.publishIndexVersion]]).
    * Same shared plumbing, so replay idempotence, staged renames, and
    * the batch-twin law all carry over. */
  def startIvfDriftMonitor(spark: SparkSession, inputDir: String,
                           schema: StructType, id: String, vec: String,
                           checkpointDir: String, centroidsDir: String,
                           countsDir: String, alarmsDir: String,
                           refCountsDir: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val cents = spark.read.parquet(centroidsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    unpersistOnTermination(spark,
      DropStats.startBucketMonitorOver(spark,
        spark.readStream.schema(schema).parquet(inputDir),
        checkpointDir, countsDir, alarmsDir)(
        batch => graft.operators.Similarity
          .ivfCellBuckets(batch, col(id), col(vec), cents)) {
        counts =>
          val ref = counts.sparkSession.read.parquet(refCountsDir)
            .select(col("grp").as("source"), col("bucket"), col("n"))
          graft.operators.Profile.psiOverCounts(ref,
              counts.select(col("grp").as("source"), col("bucket"), col("n")))
            .select(col("source").as("grp"), col("n_buckets"), col("psi"))
      },
      Seq(cents))
  }

  /** Streaming BQ drift monitor (C154h — the retrain trigger
    * [[startBqIndexAppend]]'s scaladoc prescribes): tail the SAME
    * embedding stream, maintain per-dimension bit-population partial
    * counts under the frozen stats (bucket = 2·d + bit, the
    * [[graft.operators.Similarity.bqBitBuckets]] shape — exactly the
    * bit rule the stored words pack), and after every micro-batch
    * recompute PSI against the TRAINING corpus's pinned bit
    * populations at `refCountsDir`
    * (`Similarity.bqBitCounts(trainingCorpus, vec, stats)` written to
    * parquet). Read the alarms with the C152 folklore (< 0.1 stable,
    * 0.1–0.25 investigate, > 0.25 moved → retrain+re-encode). Rides
    * [[DropStats]]'s partial-count plumbing verbatim, so replay
    * idempotence, staged alarm renames, and the batch-twin law
    * (output after N files ≡ `Profile.psiOverCounts(ref,
    * bqBitCounts(those N files))`) all carry over; the
    * smoothing/micro-nat tree is psiOverCounts' single definition, so
    * the monitor inherits the oracle-gated exactness. */
  /** The tombstone guard's documented endgame as ONE named primitive
    * (remove → compact → publish): read each streamed `batch=<id>`
    * artifact dir, anti-join the tombstone list out of it (the same
    * keyed [[graft.operators.Similarity.indexRemove]] the takedown
    * uses), rewrite to target-size files, and land everything through
    * [[graft.sources.Layout.publishIndexVersion]] as one committed
    * generation. Until now this was a hand-rolled composition —
    * `Layout.compact` is content-preserving by contract, so nothing
    * owned the "materialize the pruned table" step.
    *
    * `streamed` maps artifact name → its streamed dir; the discovered
    * `batch` ingest-bookkeeping column is dropped (publish layout,
    * not ingest history). `frozen` artifacts (stats / centroids /
    * codebooks — removal is not drift, they stay exactly right) ride
    * into the SAME generation unchanged, so a reader of the published
    * gen holds a complete consistent artifact set and searches it
    * with `tombstones = None`. Per-artifact file sizing follows
    * `Layout.compact`: partition count from the ACTUAL input bytes
    * over `targetBytes` (coalesce when merging suffices, repartition
    * when the input has too few splits). Scale shape: one column-
    * pruned scan + one broadcast-able anti-join per artifact, work
    * linear in the streamed table — nothing corpus-sized on the
    * driver. After the new generation's readers take over, point the
    * append legs' dirs at a fresh location (or the published gen's)
    * and reap the old `batch=` tree + applied tombstones; a takedown
    * landing AFTER this read is the next compaction's work, exactly
    * like one landing mid-run of an AvailableNow append.
    *
    * Returns the published generation. Parity law (spec-pinned):
    * the compacted generation ≡ rebuild-without-tombstoned
    * frame-for-frame, and a search over the published gen matches the
    * tombstone-guarded streamed read row-for-row. */
  def compactStreamedIndex(spark: SparkSession,
                           streamed: Map[String, String],
                           tombstonesDir: Option[String],
                           indexDir: String,
                           frozen: Map[String, DataFrame] = Map.empty,
                           targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(streamed.nonEmpty,
      "compactStreamedIndex needs >= 1 streamed artifact dir")
    require(streamed.keySet.intersect(frozen.keySet).isEmpty,
      s"artifact named both streamed and frozen: " +
        streamed.keySet.intersect(frozen.keySet).mkString(", "))
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val ts = tombstonesDir.map(d => spark.read.parquet(d))
    val pruned = streamed.map { case (name, dir) =>
      val raw = spark.read.parquet(dir).drop("batch")
      val guarded = ts.map(graft.operators.Similarity.indexRemove(raw, _))
        .getOrElse(raw)
      name -> sizedToSource(spark, guarded, dir, targetBytes)
    }
    graft.sources.Layout.publishIndexVersion(spark, indexDir, pruned ++ frozen)
  }

  /** The compactors' shared file-sizing rule: partition `df` so each
    * output file lands near `targetBytes`, sized from the SOURCE
    * tree's actual bytes (an upper bound after pruning/merging — a
    * compaction may only shrink). One definition so the ANN and text
    * compactors cannot diverge on the D9 sizing discipline. */
  private def sizedToSource(spark: SparkSession, df: DataFrame,
                            srcDir: String, targetBytes: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(srcDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = math.max(1, math.ceil(
      fs.getContentSummary(p).getLength.toDouble / targetBytes).toInt)
    if (df.rdd.getNumPartitions < parts) df.repartition(parts)
    else df.coalesce(parts)
  }

  /** [[compactStreamedIndex]]'s TEXT twin — the [[startTextIndexAppend]]
    * tree's endgame in one call: assemble the streamed partials
    * ([[readStreamedTextIndex]], whose tombstone path routes through
    * [[graft.functions.Keywords.textIndexRemove]] so df/ctf/stats mass
    * is SUBTRACTED), materialize the four MERGED frames at target-size
    * files, and land them through [[graft.sources.Layout
    * .publishIndexVersion]] as one committed generation. After this,
    * readers take [[readPublishedTextIndex]] — no per-query vocabulary
    * fold, no tombstone bookkeeping, no batch= small files — and the
    * ingest leg restarts against a fresh streamed tree whose partials
    * layer over the published base via [[graft.functions.Keywords
    * .textIndexAppend]]'s additive law. Work linear in the streamed
    * tree: one scan per artifact + the vocab-bounded term fold. */
  def compactStreamedTextIndex(spark: SparkSession, streamedDir: String,
                               tombstonesDir: Option[String],
                               indexDir: String,
                               targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val base = streamedDir.stripSuffix("/")
    val ix = readStreamedTextIndex(spark, streamedDir,
      tombstonesDir.map(d => spark.read.parquet(d)))
    val frames = Map("postings" -> ix.postings, "terms" -> ix.terms,
      "docs" -> ix.docs, "stats" -> ix.stats)
    graft.sources.Layout.publishIndexVersion(spark, indexDir,
      frames.map { case (n, df) =>
        n -> sizedToSource(spark, df, s"$base/$n", targetBytes) })
  }

  /** Resolve the current committed generation of a
    * [[compactStreamedTextIndex]] (or any four-artifact text-index)
    * publish tree as a ready-to-search [[graft.functions.Keywords
    * .TextIndex]] — the one-generation-never-a-mix read contract of
    * [[graft.sources.Layout.readIndexVersion]], shaped for
    * [[graft.functions.Keywords.bm25AgainstIndex]]. */
  def readPublishedTextIndex(spark: SparkSession, indexDir: String)
      : (Long, graft.functions.Keywords.TextIndex) = {
    val (gen, m) = graft.sources.Layout.readIndexVersion(spark, indexDir,
      Seq("postings", "terms", "docs", "stats"))
    (gen, graft.functions.Keywords.TextIndex(
      m("postings"), m("terms"), m("docs"), m("stats")))
  }

  /** Streaming TOKENIZER-fertility drift monitor (C162 —
    * [[startBqDriftMonitor]] for the one frozen TEXT artifact, the
    * trained BPE merge table): per micro-batch, each incoming doc's
    * quarter-unit fertility bucket under the FROZEN merges
    * ([[graft.functions.Keywords.fertilityBuckets]] — the same joined
    * apply the production tokenizer runs, so the monitored
    * distribution IS what downstream sequences pay), per-SOURCE PSI
    * against the training corpus's pinned fertility distribution at
    * `refCountsDir` ([[graft.functions.Keywords.fertilityCounts]]
    * builds the reference AND is the batch twin). Fertility mass
    * creeping upward means the vocabulary no longer fits the incoming
    * corpus — domain drift, mojibake, a new language — and the remedy
    * is the same deliberate batch job as the quantizer's: retrain the
    * merges (C153), re-apply, publish. Rides DropStats' shared
    * partial-count plumbing (replay-idempotent `batch=<id>` counts,
    * staged alarm renames, raw text never persisted — only bounded
    * (source, bucket) rows land), so the twin law, resume and replay
    * guarantees carry over unchanged. */
  def startFertilityDriftMonitor(spark: SparkSession, inputDir: String,
                                 schema: StructType, id: String, text: String,
                                 source: String, checkpointDir: String,
                                 mergesDir: String, countsDir: String,
                                 alarmsDir: String,
                                 refCountsDir: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val merges = spark.read.parquet(mergesDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    unpersistOnTermination(spark,
      DropStats.startBucketMonitorOver(spark,
        spark.readStream.schema(schema).parquet(inputDir),
        checkpointDir, countsDir, alarmsDir)(
        batch => graft.functions.Keywords.fertilityBuckets(
          batch, col(id), col(text), col(source), merges)) {
        counts =>
          val ref = counts.sparkSession.read.parquet(refCountsDir)
            .select(col("grp").as("source"), col("bucket"), col("n"))
          graft.operators.Profile.psiOverCounts(ref,
              counts.select(col("grp").as("source"), col("bucket"), col("n")))
            .select(col("source").as("grp"), col("n_buckets"), col("psi"))
      },
      Seq(merges))
  }

  def startBqDriftMonitor(spark: SparkSession, inputDir: String,
                          schema: StructType, vec: String,
                          checkpointDir: String, statsDir: String,
                          countsDir: String, alarmsDir: String,
                          refCountsDir: String): StreamingQuery = {
    graft.GraftExtensions.ensureRegistered(spark)
    val stats = spark.read.parquet(statsDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    unpersistOnTermination(spark,
      DropStats.startBucketMonitorOver(spark,
        spark.readStream.schema(schema).parquet(inputDir),
        checkpointDir, countsDir, alarmsDir)(
        batch => graft.operators.Similarity.bqBitBuckets(batch, col(vec), stats)) {
        counts =>
          val ref = counts.sparkSession.read.parquet(refCountsDir)
            .select(col("grp").as("source"), col("bucket"), col("n"))
          graft.operators.Profile.psiOverCounts(ref,
              counts.select(col("grp").as("source"), col("bucket"), col("n")))
            .select(col("source").as("grp"), col("n_buckets"), col("psi"))
      },
      Seq(stats))
  }
}
