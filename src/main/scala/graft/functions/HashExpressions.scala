package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit document fingerprint as a native Catalyst expression
  * with whole-stage codegen (SURVEY.md §2.C11 / §D4).
  *
  * A custom `Expression` (not a UDF): no serialization boundary, null
  * handling and codegen come from `UnaryExpression`, and the generated
  * code is a tight byte loop — this is the preferred extension point
  * when built-ins can't express the semantics (the builder-prompt
  * preference order (b)).
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  private final val Offset = 0xcbf29ce484222325L
  private final val Prime  = 0x100000001b3L

  /** Static so generated code can call it. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= Prime
      i += 1
    }
    h
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fnv1a64"),
    new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
    (children: Seq[Expression]) => Fnv1a64(children.head))
}
