package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Serializable holder that rebuilds the sketch lazily per JVM: the
  * expression ships only the serialized BYTES with the plan (the
  * sketch object's own serializability is then irrelevant), and each
  * executor deserializes once — not once per row.
  */
final class BloomHolder(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  def mightContain(key: Array[Byte]): Boolean = bf.mightContainBinary(key)
}

/** `bloom_might_contain(filterBytes, key)` — probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch
  * `DataFrame.stat.bloomFilter` builds) with a string key, as a native
  * codegen expression (SURVEY.md §D4): the generated code is one
  * virtual call against a per-JVM deserialized filter — the same shape
  * Spark's own runtime-filter rewrite emits, reachable from the
  * DataFrame API. The filter side must be a FOLDABLE binary (a
  * literal): a per-row filter would deserialize megabytes per row and
  * is always a bug.
  *
  * Null semantics: NULL in either side → NULL (BinaryExpression
  * default) — callers that route rows on the result must coalesce,
  * exactly like any tri-state boolean predicate.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain filter side must be BINARY, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter side must be foldable (a literal serialized filter)")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be STRING, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val holder: BloomHolder =
    new BloomHolder(left.eval(null).asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    holder.mightContain(key.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHolder", holder,
      classOf[BloomHolder].getName)
    nullSafeCodeGen(ctx, ev, (_, key) =>
      s"${ev.value} = $ref.mightContain($key.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
    (children: Seq[Expression]) => BloomMightContain(children(0), children(1)))
}
