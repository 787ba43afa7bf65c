package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass rsyslog line parse as a native Catalyst expression
  * (SURVEY.md §2.A1 / §D4): the full `ts host prog[pid]: msg` match as
  * a struct, so the five per-field `regexp_extract` calls — five regex
  * executions per row, invisible to codegen subexpression elimination
  * because each node differs in its group index — collapse to ONE
  * compiled-pattern pass. The identical `graft_syslog_parse(line)`
  * subtrees that field accessors create ARE eliminated by codegen CSE,
  * so the parse genuinely runs once per row in a projection touching
  * every field.
  *
  * Semantics mirror Spark's RegExpExtract exactly — `Matcher.find()`
  * on the same pattern, "" for every field when the line doesn't match
  * — so outputs are bit-identical to the regexp_extract formulation
  * (the DuckDB oracle gate pins this).
  */
case class SyslogParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_syslog_parse requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = SyslogParse.schema
  override def prettyName: String = "graft_syslog_parse"

  override protected def nullSafeEval(input: Any): Any =
    SyslogParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SyslogParse.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): SyslogParse =
    copy(child = newChild)
}

object SyslogParse {

  val schema: StructType = StructType(Seq(
    StructField("ts", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("prog", StringType, nullable = false),
    StructField("pid", StringType, nullable = false),
    StructField("msg", StringType, nullable = false)))

  /** Same pattern as LogColumns' R3339 regexp_extract formulation. */
  private val Pattern =
    java.util.regex.Pattern.compile("^(\\S+) (\\S+) ([^\\[ ]+)\\[(\\d+)\\]: ?(.*)$")

  private val Empty = UTF8String.EMPTY_UTF8

  /** Static so generated code can call it. `find()` + ""-on-no-match
    * replicates RegExpExtract's contract. */
  def parse(line: UTF8String): InternalRow = {
    val m = Pattern.matcher(line.toString)
    val vals = new Array[Any](5)
    if (m.find()) {
      var i = 0
      while (i < 5) {
        val g = m.group(i + 1)
        vals(i) = if (g == null) Empty else UTF8String.fromString(g)
        i += 1
      }
    } else {
      var i = 0
      while (i < 5) { vals(i) = Empty; i += 1 }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_syslog_parse"),
    new ExpressionInfo(classOf[SyslogParse].getName, "graft_syslog_parse"),
    (children: Seq[Expression]) => SyslogParse(children.head))
}
