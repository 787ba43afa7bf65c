package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native codegen expression
  * (SURVEY.md §2.C46) — the canonicalization step web-scraped corpora
  * need BEFORE any hash-keyed operator: `café` typed composed (U+00E9)
  * and decomposed (`e` + combining U+0301) are different byte strings,
  * so exact dedup (C1), MinHash shingles (C2) and fingerprints (C11)
  * all treat visually identical documents as distinct until the text
  * is normalized to one canonical form. NFC (not NFKC) is the right
  * default for dedup keys: it composes canonical equivalents without
  * folding compatibility characters (ligatures, full-width forms) that
  * may be semantically meaningful.
  *
  * A pure map stage with two allocation-free fast paths: an ASCII
  * bytes check (NFC is the identity on ASCII — the overwhelmingly
  * common case in a web corpus) and `Normalizer.isNormalized` (a scan,
  * no rewrite) for non-ASCII text already in NFC. Both return the
  * input `UTF8String` untouched; only genuinely denormalized strings
  * pay the String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static so generated code can call it. */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => NfcNormalize(children.head))
}
