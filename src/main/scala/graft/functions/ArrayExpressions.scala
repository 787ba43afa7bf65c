package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hot-path array kernels as native codegen expressions (SURVEY.md §D4).
  *
  * The `zip_with`/`aggregate` higher-order-function equivalents allocate
  * an intermediate array and a lambda frame per element; these compile to
  * a tight loop over the unsafe array data instead. Profiled on the
  * dedup/ANN operators: ~20-50× per-pair speedup, which is the difference
  * between "runs at 100 TB" and "doesn't".
  *
  * Preconditions for [[VecDot]]/[[SortedIntersectCount]] (documented,
  * not checked per-element): arrays carry no null elements — graft
  * builds them with transform/sort_array over non-null source columns.
  * [[HammingDistance]] CHECKS (length match + no nulls, clear error):
  * it is the one kernel whose silent-prefix answer would look
  * plausible to a SQL caller.
  */

/** Dot product of two array<double> columns (same element order as the
  * HOF formulation: left-to-right accumulation, so results are
  * bit-identical to aggregate(zip_with(...))). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_vec_dot requires (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))
}

/** Count of common elements between two SORTED array<long> columns with
  * distinct elements (merge-join loop) — the kernel under set-Jaccard
  * over hashed shingles. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_count requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two packed-bit code arrays (array<long>,
  * the C154 BQ layout: 32 used bits per word) — the kernel under the
  * binary-quantized ANN first pass. The HOF formulation
  * (`aggregate(zip_with(codes, qcodes, xor→bit_count))`) allocates an
  * intermediate array and two lambda frames per word; this is
  * Long.bitCount(xor) in a tight loop over the unsafe data — and the
  * BQ scan is exactly the loop that runs once per (corpus row ×
  * query) at 100 TB. Measured ~12× on 2M rows × 10 queries × 16
  * words at local[16] (HOF 2.86 s best-of-3 vs kernel 0.23 s,
  * identical sums). On EQUAL word counts — the only well-formed BQ
  * input; both sides encode under one stats table — it is the same
  * left-to-right sum of the same exact integers, so swapping
  * formulations cannot move the shortlist (spec-pinned). Mismatched
  * word counts or null elements are malformed and RAISE a clear error
  * (the function is registered session-wide, so arbitrary SQL reaches
  * it: a silent shorter-prefix sum — or the garbage/NPE a raw
  * getLong on a null element reads — would be a plausible-looking
  * wrong number; internal BQ callers always pass equal-length
  * non-null codes and never hit either branch). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hamming requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HammingDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_hamming: code arrays must be the same length, got $n and ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_hamming: code arrays must carry no null elements (index $i)")
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hamming"),
    new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
    (children: Seq[Expression]) => HammingDistance(children(0), children(1)))
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count"),
    (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)))
}
