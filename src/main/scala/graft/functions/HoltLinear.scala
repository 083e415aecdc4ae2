package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast, EqualTo, Expression, If, IsNull, Literal, Multiply, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Holt's linear-trend (double exponential) smoothing as a declarative
  * window aggregate — the [[EwmMean]] pattern: O(1) buffer (level,
  * trend, cnt), order-sensitive, no partial merge.
  *
  * Recursion (Holt 1957): l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
  * b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}; seeds l_1 = x_1, b_1 = 0
  * (documented convention — no lookahead seed). The evaluation emits
  * the one-step-ahead forecast l_t + b_t. Each update is a fixed tree
  * of IEEE double ops, so a DuckDB recursive CTE performing the same
  * ops in the same order reproduces every intermediate bit-for-bit
  * (the ema_macd oracle precedent).
  */
case class HoltLinear(child: Expression, alpha: Double, beta: Double)
    extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "holt_linear"

  private val level = AttributeReference("level", DoubleType, nullable = false)()
  private val trend = AttributeReference("trend", DoubleType, nullable = false)()
  private val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(level, trend, cnt)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    val first = EqualTo(cnt, Literal(0L))
    val newL = If(first, x,
      Add(Multiply(Literal(alpha), x),
        Multiply(Literal(1.0 - alpha), Add(level, trend))))
    val newB = If(first, Literal(0.0),
      Add(Multiply(Literal(beta), Subtract(newL, level)),
        Multiply(Literal(1.0 - beta), trend)))
    Seq(
      If(IsNull(x), level, newL),
      If(IsNull(x), trend, newB),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    throw new UnsupportedOperationException(
      "holt_linear is order-sensitive and cannot merge unordered partial " +
        "aggregates; use it as a window aggregate: " +
        "holt_linear(x, alpha, beta) OVER (PARTITION BY key ORDER BY time)")

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType), Add(level, trend))

  override protected def withNewChildInternal(newChild: Expression): HoltLinear =
    copy(child = newChild)
}

object HoltLinear {
  /** One-step-ahead Holt forecast as an aggregate Column; apply with a
    * running `PARTITION BY key ORDER BY time` frame.
    */
  def holt(col: Column, alpha: Double, beta: Double): Column = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    GraftShims.column(
      HoltLinear(GraftShims.expression(col), alpha, beta).toAggregateExpression())
  }
}
