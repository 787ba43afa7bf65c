package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: the Spark implementation plus (where ANSI-SQL can
  * express it) a DuckDB oracle over the same parquet tables. Output
  * column names MUST match between `fn` and `oracle` — the driver's
  * compare sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Scratch paths handed out this JVM, reaped on exit: the
    * per-applicationId suffix that fixed the concurrent-run race also
    * means no run ever overwrites another's dirs, so without a reaper
    * every verify/bench invocation would leave corpus-sized parquet/
    * ORC/CSV copies under java.io.tmpdir forever. */
  private val issuedScratch =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val reaperInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Per-run scratch path for queries that materialize an
    * intermediate layout (index round-trips, format round-trips).
    * Suffixed with the Spark application id so two concurrent
    * verify/bench runs on one machine never race on the same
    * directory (a fixed path under java.io.tmpdir did); a JVM
    * shutdown hook deletes every dir issued by THIS process (each
    * run reaps only its own applicationId-suffixed paths, so the
    * concurrent-run safety is untouched). */
  def scratchDir(s: SparkSession, name: String): String = {
    val dir = new java.io.File(s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_${name}_${s.sparkContext.applicationId}").toString
    issuedScratch.add(dir)
    if (reaperInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread("graft-scratch-reaper") {
        override def run(): Unit = {
          val it = issuedScratch.iterator()
          while (it.hasNext) deleteRecursively(new java.io.File(it.next()))
        }
      })
    }
    dir
  }

  /** Deterministic dump order for a driver-gate query whose final
    * output is bounded (pair lists, reports, top-k, weight tables):
    * round-robin the finished rows to ONE partition and sort there,
    * instead of a global `orderBy`. A global sort plans a range
    * exchange whose boundary-SAMPLING pass re-executes the final
    * stage's lineage — including rebuilding any broadcast below it
    * whose subtree is nondeterministic and so can't be reused —
    * before the real pass runs; measured 2.1× on the heavy dedup
    * gates (qdedup_ngram_collapsed 18.5 s → 9.0 s, plain ngram
    * 10.7 s → 5.3 s at sf0.1). `repartition(1)` shuffles only the
    * bounded RESULT; every upstream stage keeps full parallelism.
    *
    * This is the gate/dump wrapper, not the operator contract: the
    * operators themselves return unordered frames, and a 100 TB
    * caller who needs a total order over a corpus-sized result
    * should use `orderBy` there — the range sort IS the scalable
    * path, and its sampling tax amortizes over large outputs.
    *
    * When to use which (same-window A/B over 14 gates, r17): the
    * dump wins when the lineage ABOVE the last exchange is expensive
    * to re-execute — heavy verify joins, a broadcast whose
    * nondeterministic subtree defeats reuse — and the rows are thin
    * (id/id/score). `orderBy` wins when the final frame sits on a
    * checkpoint or cached scan (iterative graph ops: the sampling
    * pass re-reads it nearly for free, while the dump pays a real
    * extra shuffle) or when rows are wide (text-carrying apply
    * outputs: a single task then sorts and writes the whole corpus).
    * Measure before switching a gate either way. */
  def orderedDump(df: DataFrame,
                  cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Shared oracle-parity helpers (see SURVEY.md §6). */
  object sqlutil {
    /** DuckDB side of decimal-exact double aggregation. */
    def dsum(expr: String): String =
      s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"

    /** DuckDB CTE chain computing the signed-BIGINT FNV-1a of string
      * expression `keyExpr` — bit-identical to graft's `fnv1a64`
      * expression (list_reduce over char codes with HUGEINT mod-2⁶⁴,
      * then the ≥2⁶³ signed cast; `ord(char)` == UTF-8 byte on the
      * ASCII corpora, verified). THE single definition: every FNV
      * oracle (fingerprint, sampling, packing, IVF cell seeding)
      * must build on this so a future fix can't diverge them.
      *
      * Emits CTEs `<p>ks → <p>by → <p>f → <p>g`; `<p>g` carries
      * (`carry`..., `sb`). `carry` must be plain columns of `from`.
      */
    def fnvSignedCtes(prefix: String, keyExpr: String,
                      carry: Seq[String], from: String): String = {
      val cs = if (carry.isEmpty) "" else carry.mkString("", ", ", ",")
      s"""${prefix}ks AS (SELECT $cs ($keyExpr) AS k FROM $from),
      ${prefix}by AS (SELECT $cs
               [ord(substring(k, i, 1)) FOR i IN range(1, length(k)+1)] AS bytes
             FROM ${prefix}ks),
      ${prefix}f AS (SELECT $cs list_reduce(
              list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(bytes, x -> CAST(x AS HUGEINT))),
              (h, b) -> (xor(h, b) * 1099511628211) % 18446744073709551616::HUGEINT) AS fh
            FROM ${prefix}by),
      ${prefix}g AS (SELECT $cs
              CAST(CASE WHEN fh >= 9223372036854775808::HUGEINT
                   THEN fh - 18446744073709551616::HUGEINT ELSE fh END AS BIGINT) AS sb
            FROM ${prefix}f)"""
    }
  }
}
