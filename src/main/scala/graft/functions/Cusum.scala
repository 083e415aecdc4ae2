package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** One-sided CUSUM control statistic (Page 1954) — the sequential
  * burst/changepoint detector:
  * {{{
  *   s_t = max(0, s_{t-1} + (x_t - k))
  * }}}
  * where k is the reference (allowance) value. A sustained upward
  * shift in x accumulates in s and crosses the decision threshold far
  * sooner than any fixed per-point test; s resets toward 0 while the
  * series behaves.
  *
  * The third custom running-window aggregate after [[EwmMean]] and
  * [[HoltLinear]], same execution contract: evaluated over the
  * running frame (UNBOUNDED PRECEDING → CURRENT ROW) the window
  * executor realizes the recursion in one sequential pass with O(1)
  * state, and `mergeExpressions` throws because an order-sensitive
  * recursion must never merge unordered partials. All arithmetic is
  * EXACT LongType — monitoring integer counts needs no rounding
  * contract at all, and the DuckDB oracle replays the recursion as a
  * recursive CTE bit-for-bit.
  *
  * Null inputs leave the accumulator untouched (a missing
  * observation neither accumulates nor resets).
  */
case class Cusum(child: Expression, k: Long)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cusum"

  private val s = AttributeReference("s", LongType, nullable = false)()
  private val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(s, cnt)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, LongType)
    val step = Add(s, Subtract(x, Literal(k)))
    Seq(
      If(IsNull(x), s, If(LessThan(step, Literal(0L)), Literal(0L), step)),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "cusum is order-sensitive and cannot merge unordered partial " +
        "aggregates; use it as a window aggregate: " +
        "cusum(x, k) OVER (PARTITION BY key ORDER BY time)")

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, LongType), s)

  override protected def withNewChildInternal(newChild: Expression): Cusum =
    copy(child = newChild)
}

object Cusum {
  /** `cusum(col, k)` as an aggregate Column; apply with
    * `.over(Window.partitionBy(...).orderBy(...))` for the per-row
    * CUSUM series.
    */
  def cusum(col: Column, k: Long): Column =
    GraftShims.column(Cusum(GraftShims.expression(col), k).toAggregateExpression())
}
