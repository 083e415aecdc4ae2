package graft

import org.apache.spark.sql.functions._
import graft.operators.Summary

/** Performance summary (SURVEY.md §2.4 A4-A10) — small-fixture checks of
  * the order-safe first/last semantics and the literal-reference Sharpe
  * (avg/std, /root/reference/analyze_visualize.py:278-280).
  */
class SummarySpec extends SparkSpec {

  test("per-symbol summary on a known series") {
    val df = bars("A", Seq(10.0, 11.0, 12.0))
    val r = Summary.performance(df).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("trading_days") == 3)
    assert(row.getAs[Double]("first_close") == 10.0)
    assert(row.getAs[Double]("last_close") == 12.0)
    assert(math.abs(row.getAs[Double]("total_return_pct") - 20.0) < 1e-9)
    assert(row.getAs[Double]("period_high") == 13.0) // high = close + 1
    assert(row.getAs[Double]("period_low") == 9.0) // low = close - 1
    // returns: +10%, +9.0909..% → avg 9.5454..., sample std > 0, sharpe = avg/std
    val avg = row.getAs[Double]("avg_daily_return")
    val vol = row.getAs[Double]("return_volatility")
    val sharpe = row.getAs[Double]("sharpe")
    assert(math.abs(avg - 9.5455) < 1e-3)
    assert(vol > 0)
    assert(math.abs(sharpe - avg / vol) < 1e-3)
  }

  test("first/last are date-ordered, not partition-ordered") {
    // shuffle the input row order; min_by/max_by must still pick by date
    val df = bars("A", Seq(10.0, 11.0, 12.0)).orderBy(rand(7))
    val row = Summary.performance(df).collect().head
    assert(row.getAs[Double]("first_close") == 10.0)
    assert(row.getAs[Double]("last_close") == 12.0)
  }
}
