package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Unicode NFC canonicalization (SURVEY.md S2.C46): the edge cases the
  * qtext_normalize oracle's cross-engine claim rests on, pinned against
  * hand-written codepoint expectations (not against DuckDB - this spec
  * is the engine-independent ground truth). */
class NfcSpec extends AnyFunSuite {
  import SparkTest._

  private def nfc(s: String): String = {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    Seq(s).toDF("t").select(TextFunctions.nfcNormalize(col("t"))).head.getString(0)
  }

  test("decomposed e + combining acute composes to U+00E9") {
    assert(nfc("café") == "café")
  }

  test("composed input is returned unchanged") {
    assert(nfc("café") == "café")
  }

  test("composed and decomposed spellings collapse to one hash key") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val keys = Seq("résumé", "résumé").toDF("t")
      .select(md5(TextFunctions.normalizeText(TextFunctions.nfcNormalize(col("t")))))
      .collect().map(_.getString(0)).toSeq
    assert(keys.distinct.size == 1)
  }

  test("NFC keeps the fi ligature (no compatibility folding - that is NFKC)") {
    assert(nfc("ﬁle") == "ﬁle")
  }

  test("partial composition: a+diaeresis+acute composes the diaeresis only") {
    // U+0061 U+0308 U+0301 -> U+00E4 U+0301 (no precomposed form exists)
    assert(nfc("ä́") == "ä́")
  }

  test("ASCII fast path is the identity") {
    assert(nfc("plain ASCII 123") == "plain ASCII 123")
    assert(nfc("") == "")
  }

  test("null propagates") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextFunctions.nfcNormalize(col("t"))).head
    assert(r.isNullAt(0))
  }

  test("qtext_normalize: parity halves normalize to an identical tail") {
    val rows = graft.functions.TextQueries.qNfc.fn(spark, sf)
      .select(col("doc_id"), col("n_chars_raw") - col("n_chars_nfc"), col("norm_text"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val collapsed = r.getLong(1)
      // even rows carry 3 combining marks that compose away; odd rows none
      assert(collapsed == (if (r.getLong(0) % 2 == 0) 3L else 0L))
      assert(r.getString(2).endsWith(" café résumé"))
    }
  }
}
