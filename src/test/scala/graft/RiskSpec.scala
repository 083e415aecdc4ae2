package graft

import graft.operators.Risk

/** Goldens for the risk family: historical VaR/CVaR, rolling
  * Sharpe/Sortino gating, OLS trend on a perfectly linear series.
  */
class RiskSpec extends SparkSpec {

  test("VaR/CVaR: 5th-percentile cut and exact tail mean") {
    // returns: -10, +11.11111111, -10, +11.11111111, -10
    // sorted 5th pct interpolates inside the -10 run → var95 = -10;
    // tail = the three -10 days → cvar = -10
    val r = Risk.varCvar(bars("A", Seq(10.0, 9.0, 10.0, 9.0, 10.0, 9.0))).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 5L)
    assert(r(0).getAs[Double]("var95") == -10.0)
    assert(r(0).getAs[Double]("cvar95") == -10.0)
    assert(r(0).getAs[Long]("n_tail") == 3L)
  }

  test("rolling Sharpe gates on full windows; Sortino nulls with no down days") {
    val df = Risk.rollingSharpe(bars("A", Seq(10.0, 10.1, 10.2, 10.3)), n = 3)
    val rows = df.orderBy("date").collect()
    assert(rows.length == 3)
    val si = rows.head.fieldIndex("sharpe")
    assert(rows(0).isNullAt(si) && rows(1).isNullAt(si)) // short windows
    assert(!rows(2).isNullAt(si) && rows(2).getAs[Double]("sharpe") > 0)
    // all three returns positive → downside deviation 0 → sortino null
    assert(rows(2).isNullAt(rows(2).fieldIndex("sortino")))
  }

  test("rolling Sortino emits once a down day enters the window") {
    val df = Risk.rollingSharpe(bars("A", Seq(10.0, 9.0, 10.0, 9.0)), n = 3)
    val last = df.orderBy("date").collect().last
    assert(!last.isNullAt(last.fieldIndex("sortino")))
    assert(last.getAs[Double]("sortino") < 0) // mean return negative
  }

  test("correlation matrix: proportional series correlate at 1, all pairs emitted") {
    val closes = Seq(10.0, 11.0, 9.0, 12.0, 13.0)
    val df = bars("A", closes)
      .union(bars("B", closes.map(_ * 2))) // identical returns
      .union(bars("C", Seq(5.0, 4.0, 6.0, 5.5, 5.0)))
    val rows = Risk.corrMatrix(df).collect()
    assert(rows.length == 3) // AB, AC, BC
    val byPair = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(byPair(("A", "B")) == 1.0)
    assert(byPair(("A", "C")) == byPair(("B", "C"))) // same series vs C
    assert(rows.forall(_.getAs[Long]("n_days") == 4L))
  }

  test("wealth index compounds returns through the exact log-sum path") {
    // +10% then -10%: wealth 110 → 99
    val rows = Risk.wealthIndex(bars("A", Seq(10.0, 11.0, 9.9)))
      .orderBy("date").collect()
    assert(rows.map(_.getAs[Double]("wealth")).toSeq == Seq(110.0, 99.0))
  }

  test("lead-lag correlation peaks at the planted offset") {
    // B's returns repeat A's one day later: corr at lag +1 is exactly 1
    val closesA = Seq(10.0, 11.0, 9.0, 12.0, 13.0, 11.0)
    // b(t) = b(t-1) · a(t-1)/a(t-2): B's day-t return = A's day-(t-1)
    val closesB = (2 until closesA.length).scanLeft(Seq(100.0, 100.0)) {
      (acc, t) => acc :+ acc.last * closesA(t - 1) / closesA(t - 2)
    }.last
    val df = bars("A", closesA).union(bars("B", closesB))
    val r = Risk.leadLagCorr(df, "A", "B", maxLag = 2).collect()
      .map(x => x.getAs[Int]("lag") -> x.getAs[Double]("corr")).toMap
    assert(r(1) == 1.0) // y_{t+1} tracks x_t exactly
    assert(r.keySet == Set(-2, -1, 0, 1, 2))
  }

  test("SMA backtest lags the signal one day and compounds only in-position days") {
    // n=2: ma full from day2. sig2 = 12 > 11 → true; position3 = sig2.
    // Day3 return = (11/12−1)·100 → strategy takes the −8.33% hit;
    // day2 position is false (day1 sig null) so strategy holds at 100.
    val rows = Risk.smaBacktest(bars("A", Seq(10.0, 12.0, 11.0, 13.0)), n = 2)
      .orderBy("date").collect()
    assert(rows.map(_.getAs[Boolean]("position")).toSeq ==
      Seq(false, true, false))
    val sw = rows.map(_.getAs[Double]("strat_wealth"))
    assert(sw(0) == 100.0) // flat day
    assert(math.abs(sw(1) - 91.6667) < 1e-3) // in position for the drop
    assert(sw(2) == sw(1)) // sig3 false (11 < 11.5) → out for day 4
    assert(math.abs(rows.last.getAs[Double]("bh_wealth") - 130.0) < 1e-3)
  }

  test("day-of-week seasonality buckets returns by weekday") {
    // bars start Wed 2020-01-01; returns exist from Thu. 8 closes →
    // one return per weekday Thu..Wed
    val rows = Risk.dowSeasonality(
      bars("A", Seq(10.0, 11.0, 12.0, 11.0, 11.0, 12.0, 13.0, 14.0)))
      .collect()
    assert(rows.map(_.getAs[Long]("dow")).toSet == (0L to 6L).toSet)
    assert(rows.map(_.getAs[Long]("n_days")).forall(_ == 1L))
    // Saturday 2020-01-04: 11 -> 12 ... wait; Thu=+10%, Sat close 11->11
    val byDow = rows.map(r => r.getAs[Long]("dow") -> r.getAs[Double]("up_frac")).toMap
    assert(byDow(4L) == 1.0) // Thu 2020-01-02: 10 -> 11
    assert(byDow(0L) == 0.0) // Sun 2020-01-05: 11 -> 11, not an up day
  }

  test("volume profile shares sum to 1 per symbol with exact bucketing") {
    val df = Risk.volumeProfile(
      bars("A", Seq(500.0, 600.0, 1500.0, 2500.0)), bucketWidth = 1000.0)
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[Long]("n_days")).toSeq == Seq(2L, 1L, 1L))
    // each share is rounded to 6dp, so the sum can be off by n·5e-7
    assert(math.abs(rows.map(_.getAs[Double]("vol_share")).sum - 1.0) < 2e-6)
  }

  test("Amihud illiquidity: monthly mean of 10dp daily carriers, zero-volume excluded") {
    import org.apache.spark.sql.functions._
    // bars volumes are 100+i; zero out the last day to test the exclusion
    val df = bars("A", Seq(10.0, 11.0, 9.9, 12.0))
      .withColumn("volume", when(col("close") === 12.0, 0L).otherwise(col("volume")))
    val r = Risk.amihudIlliq(df).collect()
    assert(r.length == 1) // one (symbol, month); day 1 has no return, day 4 zero volume
    def daily(c0: Double, c1: Double, vol: Double): BigDecimal = {
      val ret = (c1 / c0 - 1.0) * 100.0
      BigDecimal(1000000.0 * math.abs(ret) / (c1 * vol))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    val exp = BigDecimal((daily(10.0, 11.0, 101.0) + daily(11.0, 9.9, 102.0)).toDouble / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[String]("month") == "2020-01")
    assert(r(0).getAs[Long]("n_days") == 2L)
    assert(r(0).getAs[Double]("amihud_illiq") == exp)
  }

  test("Roll spread: alternating bounce gives 2·√(-cov); trending month nulls") {
    // A: closes 10,11,10,11,10 → Δp ±1 alternating → 3 pairs, cov = -8/9
    // B: monotone up → cov = 0 → null spread
    val df = bars("A", Seq(10.0, 11.0, 10.0, 11.0, 10.0))
      .unionByName(bars("B", Seq(10.0, 11.0, 12.0, 13.0)))
    val r = Risk.rollSpread(df).collect()
      .map(x => x.getAs[String]("symbol") -> x).toMap
    assert(r("A").getAs[Long]("n_pairs") == 3L)
    val covA = (-3.0 - (-1.0 * 1.0) / 3.0) / 3.0
    val exp = BigDecimal(2.0 * math.sqrt(-covA))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("A").getAs[Double]("roll_spread") == exp)
    assert(r("B").getAs[Long]("n_pairs") == 2L)
    assert(r("B").isNullAt(r("B").fieldIndex("roll_spread")))
  }

  test("OLS trend: a perfectly linear close gives slope 1, R² 1") {
    val r = Risk.trendOls(bars("A", Seq(10.0, 11.0, 12.0, 13.0))).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_days") == 4L)
    assert(r(0).getAs[Double]("slope") == 1.0)
    assert(r(0).getAs[Double]("intercept") == 9.0) // y = 9 + x, x = 1..4
    assert(r(0).getAs[Double]("r2") == 1.0)
  }
}
