package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.EwmMean

/** SparkSessionExtensions hook exposing the engine's custom Catalyst
  * expressions to SQL. Activate with
  * `.config("spark.sql.extensions", "graft.GraftSparkExtensions")` at
  * session build, or imperatively on a live session via
  * [[GraftSparkExtensions.register]].
  *
  * Registered functions:
  *  - `ewm_mean(x, alpha)` — pandas adjust=True EWM
  *    (graft.functions.EwmMean); use as a window aggregate:
  *    `ewm_mean(close, 0.5) OVER (PARTITION BY symbol ORDER BY date)`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftSparkExtensions.ewmMeanDescriptor)
    ext.injectFunction(GraftSparkExtensions.hammingDescriptor)
    ext.injectResolutionRule(_ => RejectNonWindowEwm)
  }
}

/** Analysis-time guard: `ewm_mean` inside a grouping Aggregate (not a
  * window) merges order-sensitive partial buffers nondeterministically,
  * so sessions built with these extensions reject the plan during
  * analysis instead of at execution (EwmMean.mergeExpressions throws
  * there as the second line of defense for sessions without the
  * extensions). Window use — including windows OVER grouped output,
  * where the WindowExpression transiently sits inside the Aggregate —
  * passes untouched.
  */
object RejectNonWindowEwm
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.WindowExpression
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

  private def bareEwm(e: Expression): Boolean = e match {
    case _: WindowExpression => false
    case ae: AggregateExpression if ae.aggregateFunction.isInstanceOf[EwmMean] => true
    case other => other.children.exists(bareEwm)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case agg: Aggregate if agg.aggregateExpressions.exists(bareEwm) =>
        throw new UnsupportedOperationException(
          "ewm_mean is order-sensitive and cannot be a grouping aggregate; " +
            "use it as a window aggregate: " +
            "ewm_mean(x, alpha) OVER (PARTITION BY key ORDER BY time)")
      case _ => ()
    }
    plan
  }
}

object GraftSparkExtensions {

  private def buildEwm(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"ewm_mean(x, alpha) takes 2 arguments, got ${args.length}")
    val alpha = args(1) match {
      case e if e.foldable => e.eval() match {
        case d: Double => d
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"ewm_mean alpha must be numeric, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"ewm_mean alpha must be a literal number, got $other")
    }
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    EwmMean(args.head, alpha).toAggregateExpression()
  }

  val ewmMeanDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("ewm_mean"),
    new ExpressionInfo(classOf[EwmMean].getName, "ewm_mean"),
    buildEwm _)

  val hammingDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_distance"),
    new ExpressionInfo(classOf[graft.functions.HammingDistance].getName, "hamming_distance"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"hamming_distance(a, b) takes 2 arguments, got ${args.length}")
      graft.functions.HammingDistance(args(0), args(1))
    })

  /** Imperative registration on an existing session (tests, shells). */
  def register(spark: SparkSession): Unit =
    Seq(ewmMeanDescriptor, hammingDescriptor).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
