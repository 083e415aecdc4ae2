package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exponentially-weighted moving average with pandas `adjust=True`
  * semantics — the one operator in the reference surface with no Spark
  * builtin (reference: /root/reference/analyze_visualize.py:111-116,
  * `close.ewm(span=s).mean()`).
  *
  * pandas adjust=True computes the normalized-weight form
  * {{{
  *   ema_t = num_t / den_t
  *   num_t = x_t + (1-alpha) * num_{t-1}
  *   den_t = 1  + (1-alpha) * den_{t-1}
  * }}}
  * with alpha = 2/(span+1); the first output equals the first input.
  *
  * Implementation: a declarative aggregate evaluated over a running
  * window frame (UNBOUNDED PRECEDING → CURRENT ROW). Spark's window
  * executor feeds rows to the aggregate buffer one at a time in frame
  * order, so the update expressions realize the recursion above in a
  * single streaming pass — O(1) state, no collect_list, no per-symbol
  * memory bound. This is the 100 TB-safe shape: one shuffle+sort on the
  * symbol partition, then a sequential scan.
  *
  * Grouping use (`GROUP BY k` instead of a window) would merge partial
  * buffers in partition order — nondeterministic for an order-sensitive
  * recursion — so `mergeExpressions` throws instead of silently
  * returning an order-dependent number. The window path never merges;
  * the failure fires only on the misuse.
  *
  * Null inputs leave the accumulator untouched (pandas ignore_na=False
  * differs — it decays weights across gaps — but the reference never
  * feeds nulls; the derived close column is non-null by construction).
  */
case class EwmMean(child: Expression, alpha: Double)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_mean"

  private val num = AttributeReference("num", DoubleType, nullable = false)()
  private val den = AttributeReference("den", DoubleType, nullable = false)()
  private val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(num, den, cnt)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0L))

  private def decay = Literal(1.0 - alpha)

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(
      If(IsNull(x), num, Add(x, Multiply(decay, num))),
      If(IsNull(x), den, Add(Literal(1.0), Multiply(decay, den))),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "ewm_mean is order-sensitive and cannot merge unordered partial " +
        "aggregates; use it as a window aggregate: " +
        "ewm_mean(x, alpha) OVER (PARTITION BY key ORDER BY time)")

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType), Divide(num, den))

  override protected def withNewChildInternal(newChild: Expression): EwmMean =
    copy(child = newChild)
}

object EwmMean {
  /** `ewm(col, span)` — pandas `col.ewm(span=span).mean()` (adjust=True)
    * as an aggregate Column. Apply with
    * `.over(Window.partitionBy(...).orderBy(...))`; the running frame
    * (default, or explicit ROWS UNBOUNDED PRECEDING..CURRENT ROW) gives
    * the per-row EWM series.
    */
  def ewm(col: Column, span: Int): Column = {
    require(span >= 1, s"span must be >= 1, got $span")
    val alpha = 2.0 / (span + 1.0)
    GraftShims.column(EwmMean(GraftShims.expression(col), alpha).toAggregateExpression())
  }
}
