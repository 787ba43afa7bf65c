package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join (SURVEY.md §2.B13 scale path): for every left row,
  * the single right row with equal key and the greatest right-time ≤
  * left-time (ties on right-time broken by the greatest tiebreak
  * columns) — the extension-point-(c) operator: a custom `LogicalPlan` +
  * planner `Strategy` + physical `BinaryExecNode`, registered through
  * `SparkSessionExtensions` (GraftExtensions).
  *
  * The physical operator declares hash-clustered distribution and
  * (key, time) ordering requirements, so Catalyst's EnsureRequirements
  * inserts exactly one co-partitioning shuffle+sort per side and the
  * join itself is a streaming two-pointer merge per partition: O(n+m)
  * with O(1) state — no window buffering, no per-key materialization.
  * That is the plan shape the window-based composition (q13) can't
  * reach: row_number() buffers every candidate pair first.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Seq[Attribute],
    toleranceUs: Option[Long] = None)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ties, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ties, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTieBreak: Seq[Attribute],
    toleranceUs: Option[Long] = None)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lTimeIdx = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeIdx = rightOut.indexWhere(_.exprId == rightTime.exprId)
    require(lTimeIdx >= 0 && rTimeIdx >= 0, "as-of time columns must come from the join children")
    require(leftTime.dataType == LongType && rightTime.dataType == LongType,
      "as-of time columns must be BIGINT (epoch micros)")
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
    val keyTypes = Seq(leftKey.dataType)
    val schemaOut = output
    // -1 = unbounded lookback; the merge keeps only the LATEST right row
    // ≤ left time, so if that one is outside tolerance no earlier row
    // can be inside it — a single check at emit time suffices
    val tol = toleranceUs.getOrElse(-1L)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(schemaOut, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // current right head (copied: unsafe iterators reuse buffers)
        private var rHead: UnsafeRow = _
        private var rHeadKey: UnsafeRow = _
        // best candidate for the current left key (already a copy)
        private var cand: UnsafeRow = _
        private var candKey: UnsafeRow = _
        private var nextRow: InternalRow = _

        private def advanceRightHead(): Unit = {
          rHead = null
          while (rHead == null && rIt.hasNext) {
            val r = rIt.next().asInstanceOf[UnsafeRow]
            // null keys never match (SQL equi-join semantics), null times
            // can't be ordered — drop both here
            if (!r.isNullAt(rTimeIdx) && !rKeyProj(r).isNullAt(0)) {
              rHead = r.copy()
              rHeadKey = rKeyProj(rHead).copy()
            }
          }
        }

        private def computeNext(): Unit = {
          nextRow = null
          while (nextRow == null && lIt.hasNext) {
            val l = lIt.next()
            val lKey = if (l.isNullAt(lTimeIdx)) null else lKeyProj(l)
            if (lKey != null && !lKey.isNullAt(0)) {
              val lTime = l.getLong(lTimeIdx)
              if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
                cand = null; candKey = null
              }
              if (rHead == null && rIt.hasNext) advanceRightHead()
              var advancing = true
              while (advancing && rHead != null) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 || (c == 0 && rHead.getLong(rTimeIdx) <= lTime)) {
                  if (c == 0) { cand = rHead; candKey = rHeadKey }
                  advanceRightHead()
                } else advancing = false
              }
              if (cand != null &&
                  (tol < 0L || lTime - cand.getLong(rTimeIdx) <= tol))
                nextRow = resultProj(joined(l, cand))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) computeNext()
          nextRow != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API. */
object AsOfJoin {

  /** Inner as-of join: one output row per left row that has a right
    * match with equal `key` and greatest `rightTime ≤ leftTime` (ties on
    * right time resolved by greatest `rightTieBreak`). Time columns must
    * be BIGINT epoch-micros. `toleranceUs` bounds the lookback (pandas
    * merge_asof-style): a left row only matches when
    * `leftTime − rightTime ≤ toleranceUs`.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: Seq[String] = Nil,
           toleranceUs: Option[Long] = None): DataFrame = {
    val spark: SparkSession = left.sparkSession
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightTieBreak.map(attr(rPlan, _)), toleranceUs))
  }
}
