package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row text-repetition kernels (SURVEY.md LLM pack). Documents are
  * rows, so repetition metrics/scrubs are per-row math: these expressions
  * keep the whole Gopher filter family inside whole-stage codegen with ZERO
  * shuffle — the explode+groupBy formulations in
  * [[graft.operators.Repetition]] exist only as cross-check references
  * (spec-asserted equal). */
object TextStatsExpressions {

  private val KernelsClass = "graft.functions.expressions.Kernels"

  /** [n_lines, n_distinct_lines, total_chars, dup_chars] per document. */
  case class LineStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Kernels.lineStats(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $KernelsClass.lineStats($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "line_stats"
  }

  /** Document with only the first occurrence of each line kept, in order. */
  case class DropRepeatedLinesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Kernels.dropRepeatedLines(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $KernelsClass.dropRepeatedLines($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "drop_repeated_lines"
  }

  /** struct(count, coverage, gram): the most frequent word n-gram under the
    * (count, count×gramChars, gram) struct-max order; (0, 0, null) below n
    * tokens. */
  case class TopNgramExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "n must be >= 1")
    override def dataType: DataType = StructType(Seq(
      StructField("cnt", LongType, nullable = false),
      StructField("cov", LongType, nullable = false),
      StructField("gram", StringType, nullable = true)))
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      Kernels.topNgram(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $KernelsClass.topNgram($c, $n);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "top_ngram"
  }

  /** struct(n_tokens, n_removed, scrubbed_text): the document rebuilt with
    * every token covered by a hot n-gram start removed, in one pass
    * ([[Kernels.scrubSpans]]). `starts` must be a sorted-ascending int array
    * (token positions); the HOF formulation this replaces (filter + exists
    * per token) evaluated interpreted and cost O(tokens × starts). */
  case class ScrubSpansExpr(left: Expression, right: Expression, n: Int)
      extends BinaryExpression {
    require(n >= 1, "n must be >= 1")
    // analysis-time input check: the kernel reads starts via getInt — an
    // unchecked SQL caller passing array<bigint> positions would be read 4
    // bytes per 8-byte slot (silent garbage) instead of failing analysis
    // NullType stays accepted (a NULL literal or empty array() null-propagates
    // / yields the unscrubbed row, as before the check existed)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType | NullType, ArrayType(IntegerType | NullType, _) | NullType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"scrub_spans expects (string, array<int>), got (${l.sql}, ${r.sql})")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_removed", LongType, nullable = false),
      StructField("scrubbed_text", StringType, nullable = false)))
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(t: Any, s: Any): Any =
      Kernels.scrubSpans(t.asInstanceOf[UTF8String],
        s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $KernelsClass.scrubSpans($a, $b, $n);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "scrub_spans"
  }

  def line_stats(text: Column): Column = column(LineStatsExpr(expression(text)))
  def drop_repeated_lines(text: Column): Column =
    column(DropRepeatedLinesExpr(expression(text)))
  def top_ngram(text: Column, n: Int): Column = column(TopNgramExpr(expression(text), n))
  def scrub_spans(text: Column, starts: Column, n: Int): Column =
    column(ScrubSpansExpr(expression(text), expression(starts), n))
}
