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

/** Seeded murmur3 fmix64 re-hash (SURVEY.md §2.C134) — the MinHash
  * "permutation" family as one oracle-replicable finalizer chain:
  * `z = h XOR seed`, then the public MurmurHash3 fmix64 avalanche
  * (Appleby 2011, public domain) of two xorshift-multiply rounds. A
  * single wrapped multiply (the FNV step) is NOT enough here: its
  * slot-to-slot rankings stay correlated and the MinHash match-count
  * estimator's variance blows past the k-slot bound (measured 2.5× σ
  * with pathological all-slots-match pairs at true J ≈ 0.6; fmix64
  * lands on the theoretical √(J(1−J)/k)). Every step is xor /
  * logical-shift / mod-2⁶⁴ multiply — DuckDB mirrors with HUGEINT
  * arithmetic and `// 2^33` for the unsigned shift (the C3 recipe).
  * A native expression because ANSI mode makes wrapped `*` on long
  * columns a runtime error — codegen Java wraps intentionally. */
case class Mix64(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mix64 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override protected def nullSafeEval(seed: Any, h: Any): Any =
    Mix64.mix(seed.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, h) => s"graft.functions.Mix64.mix($s, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Mix64 =
    copy(left = newLeft, right = newRight)
}

object Mix64 {
  /** Static so generated code can call it. */
  def mix(seed: Long, h: Long): Long = {
    var z = h ^ seed
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_mix64"),
    new ExpressionInfo(classOf[Mix64].getName, "graft_mix64"),
    (children: Seq[Expression]) => Mix64(children(0), children(1)))
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
