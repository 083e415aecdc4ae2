package graft

import org.apache.spark.sql.functions._
import graft.operators.Indicators

/** pandas-parity goldens for the rolling/lag indicator family
  * (SURVEY.md §2.5) — pandas 2.2.2, literal reference formulas
  * (/root/reference/analyze_visualize.py:106-139).
  */
class IndicatorsSpec extends SparkSpec {

  val closes = Seq(10.0, 11.0, 9.0, 12.0, 13.0, 12.5, 11.0, 14.0, 15.5, 15.0,
    16.0, 14.5, 13.0, 15.0, 16.5, 17.0, 16.0, 18.0, 19.0, 18.5)
  val df = bars("A", closes)

  val sma3mp1 = Seq(10.0, 10.5, 10.0, 10.666666666666666, 11.333333333333334, 12.5, 12.166666666666666, 12.5, 13.5, 14.833333333333334, 15.5, 15.166666666666666, 14.5, 14.166666666666666, 14.833333333333334, 16.166666666666668, 16.5, 17.0, 17.666666666666668, 18.5)
  val roll3 = Seq(Double.NaN, Double.NaN, 10.0, 10.666666666666666, 11.333333333333334, 12.5, 12.166666666666666, 12.5, 13.5, 14.833333333333334, 15.5, 15.166666666666666, 14.5, 14.166666666666666, 14.833333333333334, 16.166666666666668, 16.5, 17.0, 17.666666666666668, 18.5)
  val roll3std = Seq(Double.NaN, Double.NaN, 1.0, 1.5275252316519468, 2.0816659994661326, 0.4999999999999991, 1.0408329997330656, 1.4999999999999993, 2.2912878474779195, 0.7637626158259722, 0.4999999999999978, 0.7637626158259717, 1.4999999999999991, 1.0408329997330652, 1.7559422921421224, 1.0408329997330643, 0.49999999999999467, 0.9999999999999973, 1.5275252316519445, 0.499999999999992)
  val diffG = Seq(Double.NaN, 1.0, -2.0, 3.0, 1.0, -0.5, -1.5, 3.0, 1.5, -0.5, 1.0, -1.5, -1.5, 2.0, 1.5, 0.5, -1.0, 2.0, 1.0, -0.5)
  val pct = Seq(Double.NaN, 10.000000000000009, -18.181818181818176, 33.33333333333333, 8.333333333333325, -3.8461538461538436, -12.0, 27.27272727272727, 10.71428571428572, -3.2258064516129004, 6.666666666666665, -9.375, -10.344827586206895, 15.384615384615374, 10.000000000000009, 3.0303030303030276, -5.882352941176472, 12.5, 5.555555555555558, -2.631578947368418)
  val rsi14 = Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 62.50000000000001, 65.11627906976744, 64.28571428571428, 67.5, 65.78947368421052, 65.78947368421052, 65.78947368421052)
  val vol5 = Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, 19.040985553427742, 20.36085113768509, 19.48955925063926, 15.009160816996161, 15.4615689233343, 14.868153035332238, 14.10550541336668, 9.465188012857313, 11.025910075062269, 11.679297537956764, 11.463575891409787, 10.697879111509339, 8.53324490416999, 7.138901714454945, 7.180068761693764)

  test("SMA min_periods=1 (W1) matches pandas rolling(3, min_periods=1)") {
    assertColumn(df.withColumn("x", Indicators.sma(3)), "x", sma3mp1)
  }

  test("gated MA (W2) reproduces default min_periods leading nulls") {
    assertColumn(df.withColumn("x", Indicators.maGated(3)), "x", roll3)
  }

  test("gated rolling std is sample (ddof=1) with leading nulls (W8/W12)") {
    assertColumn(
      df.withColumn("x", Indicators.gated(3, col("close"), stddev_samp)),
      "x", roll3std)
  }

  test("diff (W9) nulls the first row") {
    assertColumn(df.withColumn("x", Indicators.diff), "x", diffG)
  }

  test("pct_change*100 (W11) matches pandas") {
    assertColumn(df.withColumn("x", Indicators.dailyReturn), "x", pct)
  }

  test("RSI(14) (W10) matches pandas incl. the leading-null-delta→0 quirk") {
    assertColumn(df.withColumn("x", Indicators.rsi(14)), "x", rsi14)
  }

  test("volatility (W12) = rolling std of returns with non-null gating") {
    val withRet = df.withColumn("dr", Indicators.dailyReturn)
    assertColumn(
      withRet.withColumn("x", Indicators.volatility(5, col("dr"))), "x", vol5)
  }

  test("RSI edge: monotonic rise → 100 after warmup; flat → null") {
    val rising = bars("A", (1 to 20).map(_.toDouble))
      .withColumn("x", Indicators.rsi(14)).orderBy("date")
      .select("x").collect()
    assert(rising.take(13).forall(_.isNullAt(0)))
    assert(rising.drop(13).forall(r => r.getDouble(0) == 100.0))
    val flat = bars("A", Seq.fill(20)(5.0))
      .withColumn("x", Indicators.rsi(14)).orderBy("date")
      .select("x").collect()
    assert(flat.forall(_.isNullAt(0)), "flat series: gain=loss=0 → null RSI")
  }

  test("normalize to base 100 (W13) starts at 100 per symbol") {
    val n = bars("A", closes).unionByName(bars("B", closes.map(_ * 3)))
      .withColumn("x", Indicators.normalizeBase100)
    val firsts = n.filter(col("date") === lit("2020-01-01").cast("date"))
      .select("x").collect().map(_.getDouble(0))
    assert(firsts.forall(v => math.abs(v - 100.0) < 1e-12))
  }

  test("bollinger bands (W8) ordering holds where defined") {
    val bb = Indicators.bollinger(20)
    val r = bars("A", closes ++ closes)
      .withColumn("m", bb(0)._2).withColumn("u", bb(1)._2).withColumn("l", bb(2)._2)
      .filter(col("m").isNotNull)
    assert(r.filter(col("u") < col("m") || col("m") < col("l")).count() == 0)
    assert(r.count() > 0)
  }
}
