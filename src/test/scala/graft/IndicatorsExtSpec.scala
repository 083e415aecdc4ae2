package graft

import org.apache.spark.sql.functions._
import graft.operators.IndicatorsExt

/** Hand-computed goldens for the extended indicator family (ATR,
  * stochastic, OBV, VWAP, drawdown, crossovers, pair corr, beta).
  * The bars fixture gives high=close+1, low=close-1, volume=100+i.
  */
class IndicatorsExtSpec extends SparkSpec {

  test("ATR: TR falls back to high-low on the first row, gated SMA after") {
    val df = IndicatorsExt.withAtr(bars("A", Seq(10.0, 11.0, 9.0, 12.0)), 2)
    // TR: row0 high-low=2; row1 max(2,|12-10|,|10-10|)=2;
    // row2 max(2,|10-11|,|8-11|)=3; row3 max(2,|13-9|,|11-9|)=4
    assertColumn(df, "tr", Seq(2.0, 2.0, 3.0, 4.0))
    assertColumn(df, "atr", Seq(Double.NaN, 2.0, 2.5, 3.5))
  }

  test("stochastic %K uses the n-day high/low channel, %D averages rounded %K") {
    val df = IndicatorsExt.withStochastic(bars("A", Seq(10.0, 11.0, 9.0, 12.0, 14.0)), 3, 3)
    // row2: (9-8)/(12-8)*100=25; row3: (12-8)/(13-8)*100=80;
    // row4: (14-8)/(15-8)*100=85.7143
    assertColumn(df, "stoch_k", Seq(Double.NaN, Double.NaN, 25.0, 80.0, 85.7143))
    assertColumn(df, "stoch_d", Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN, 63.5714))
  }

  test("OBV signs volume by close direction, first row contributes zero") {
    val df = IndicatorsExt.withObv(bars("A", Seq(10.0, 11.0, 9.0, 12.0)))
    assertColumn(df.withColumn("obv_d", col("obv").cast("double")), "obv_d",
      Seq(0.0, 101.0, -1.0, 102.0))
  }

  test("rolling VWAP = exact decimal sum(close*volume)/sum(volume)") {
    val df = IndicatorsExt.withVwap(bars("A", Seq(10.0, 11.0, 9.0, 12.0)), 2)
    assertColumn(df, "vwap", Seq(10.0, 10.502488, 9.995074, 10.507317))
  }

  test("drawdown tracks the running peak; summary picks the worst") {
    val df = IndicatorsExt.withDrawdown(bars("A", Seq(10.0, 11.0, 9.0, 12.0)))
    assertColumn(df, "drawdown_pct", Seq(0.0, 0.0, -18.181818, 0.0))
    val s = IndicatorsExt.maxDrawdown(bars("A", Seq(10.0, 11.0, 9.0, 12.0))).collect()(0)
    assert(s.getAs[Double]("max_drawdown_pct") == -18.181818)
    assert(s.getAs[Long]("days_underwater") == 1L)
    assert(s.getAs[Long]("trading_days") == 4L)
  }

  test("crossovers emit golden/death events only on state flips") {
    val df = IndicatorsExt.crossovers(
      bars("A", Seq(10.0, 11.0, 9.0, 12.0, 13.0, 9.0, 8.0)), 2, 3)
    val rows = df.orderBy("date").collect()
    // ma2 vs ma3: false,false,true(row4),false(row5),false → flip at
    // rows 4 (golden) and 5 (death)
    assert(rows.map(_.getAs[String]("signal")).toSeq == Seq("golden_cross", "death_cross"))
    assert(rows.map(_.getAs[java.sql.Date]("date").toString).toSeq ==
      Seq("2020-01-05", "2020-01-06"))
  }

  test("Holt forecast follows the level/trend recursion by hand") {
    // α = β = 0.5, closes 10, 12, 11:
    // t1: l=10, b=0 → f=10
    // t2: l=.5·12+.5·10=11, b=.5·(11−10)=0.5 → f=11.5
    // t3: l=.5·11+.5·11.5=11.25, b=.5·0.25+.5·0.5=0.375 → f=11.625
    val df = IndicatorsExt.holtForecast(
      bars("A", Seq(10.0, 12.0, 11.0)), alpha = 0.5, beta = 0.5)
    assertColumn(df, "forecast_next", Seq(10.0, 11.5, 11.625))
  }

  test("overnight gaps: only beyond-threshold days survive, signed correctly") {
    // bars: open = close - 0.5. closes 10, 10.1 → day2 gap =
    // (9.6/10 - 1)·100 = -4% (down); closes 10.1, 10.6 → day3 gap =
    // (10.1/10.1 - 1) = 0% (filtered)
    val rows = IndicatorsExt.overnightGaps(
      bars("A", Seq(10.0, 10.1, 10.6, 11.5)), thresholdPct = 2.0).collect()
    // day2: -4 (down); day3: 0 (none); day4: (11.0/10.6-1)·100 = +3.77 (up)
    assert(rows.map(r => (r.getAs[java.sql.Date]("date").toString,
      r.getAs[String]("gap_dir"))).toSeq ==
      Seq(("2020-01-02", "gap_down"), ("2020-01-04", "gap_up")))
  }

  test("Keltner: span-1 midline collapses to typical price; bands gate on ATR") {
    // bars fixture: typical = ((c+1)+(c-1)+c)/3 = c; span=1 → decay 0,
    // EWM = last value; atrN=2 gates the first row's bands
    val df = IndicatorsExt.withKeltner(bars("A", Seq(10.0, 11.0)), span = 1, atrN = 2)
    val rows = df.orderBy("date").collect()
    assert(rows.map(_.getAs[Double]("kc_mid")).toSeq == Seq(10.0, 11.0))
    assert(rows(0).isNullAt(rows(0).fieldIndex("kc_upper")))
    // tr row1 = max(high-low=2, |12-10|=2, |10-10|=0) = 2; atr = (2+2)/2 = 2
    assert(rows(1).getAs[Double]("kc_upper") == 15.0)
    assert(rows(1).getAs[Double]("kc_lower") == 7.0)
  }

  test("MAD outliers: the spike day flags, steady days do not") {
    // returns ≈ 1% four times then +92.3% — mean/stddev z would be
    // diluted by the spike itself; the MAD z isolates it
    val df = IndicatorsExt.madOutliers(
      bars("A", Seq(10.0, 10.1, 10.2, 10.3, 10.4, 20.0)))
    val rows = df.orderBy("date").collect()
    assert(rows.length == 5) // first day has no return
    assert(rows.map(_.getAs[Boolean]("is_outlier")).toSeq ==
      Seq(false, false, false, false, true))
    assert(rows.last.getAs[Double]("rob_z") > 3.5)
  }

  test("MAD outliers: constant returns give MAD 0 and null-safe z") {
    val df = IndicatorsExt.madOutliers(bars("A", Seq(10.0, 10.0, 10.0)))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("rob_z"))))
  }

  test("pair correlation of identical return series is 1 at full windows") {
    val closes = Seq(10.0, 11.0, 9.0, 12.0)
    val df = IndicatorsExt.pairReturnCorr(
      bars("AF", closes).unionByName(bars("NO", closes)), "AF", "NO", 3)
    assertColumn(df, "corr_ret", Seq(Double.NaN, Double.NaN, 1.0))
  }

  test("returnMoments: alternating ±10% returns give zero skew, kurtosis -2") {
    // closes engineered so the rounded returns are exactly +10,-10,+10,-10
    val df = IndicatorsExt.returnMoments(
      bars("A", Seq(100.0, 110.0, 99.0, 108.9, 98.01)))
    val r = df.collect()(0)
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("excess_kurtosis") == -2.0)
  }

  test("Donchian: selection bands, gated start, breakout vs yesterday's band") {
    // highs = close+1, lows = close-1
    val df = IndicatorsExt.withDonchian(bars("A", Seq(10.0, 12.0, 9.0, 15.0, 7.0)), 2)
    assertColumn(df, "dc_upper", Seq(Double.NaN, 13.0, 13.0, 16.0, 16.0))
    assertColumn(df, "dc_lower", Seq(Double.NaN, 9.0, 8.0, 8.0, 6.0))
    assertColumn(df, "dc_mid", Seq(Double.NaN, 11.0, 10.5, 12.0, 11.0))
    val b = df.orderBy("date").collect().map(r =>
      Option(r.getAs[String]("breakout")))
    // row3: close 15 > yesterday's upper 13 → up;
    // row4: close 7 < yesterday's lower 8 → down; others null
    assert(b.toSeq == Seq(None, None, None, Some("up"), Some("down")))
  }

  test("range vol: Parkinson from the 8dp log carriers; GK nulls when negative") {
    val spark2 = spark
    import spark2.implicits._
    // second bar is deliberately inconsistent (high/low inside the
    // open→close move): u=ln2, v=ln8 → GK inner < 0 → null, park real
    val df = Seq(
      ("A", "2020-01-01", 1.0, 4.0, 1.0, 4.0, 1L),
      ("A", "2020-01-02", 1.0, 2.0, 1.0, 8.0, 1L))
      .toDF("symbol", "ds", "open", "high", "low", "close", "volume")
      .selectExpr("symbol", "CAST(ds AS DATE) AS date", "open", "high", "low", "close", "volume")
    val r = IndicatorsExt.rangeVol(df, n = 1).orderBy("date").collect()
    def park(u: Double): Double = {
      // mirror the operator: 8dp DECIMAL carrier, exact decimal square,
      // then the double formula and the 6dp final round
      val u8 = BigDecimal(u).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      val su2 = (u8 * u8).toDouble
      BigDecimal(math.sqrt(252.0) * math.sqrt(su2 / (4.0 * math.log(2.0) * 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(r(0).getAs[Double]("park_vol") == park(math.log(4.0)))
    // day 1: u = v = ln4 → inner = u²(1/2 − (2ln2−1)) > 0 → GK real
    assert(!r(0).isNullAt(r(0).fieldIndex("gk_vol")))
    assert(r(1).getAs[Double]("park_vol") == park(math.log(2.0)))
    assert(r(1).isNullAt(r(1).fieldIndex("gk_vol")))
  }

  test("rolling beta recovers the return multiple once the window fills") {
    // B's returns are exactly 2x A's → market = 1.5x A → betas 2/3, 4/3
    val df = bars("A", Seq(100.0, 110.0, 99.0))
      .unionByName(bars("B", Seq(100.0, 120.0, 96.0)))
    val r = IndicatorsExt.rollingBeta(df, n = 2).collect()
      .map(x => (x.getAs[String]("symbol"), x.getAs[java.sql.Date]("date").toString) ->
        Option(x.getAs[java.lang.Double]("beta")))
      .toMap
    assert(r(("A", "2020-01-02")).isEmpty) // one return: window not full
    assert(r(("A", "2020-01-03")).contains(0.666667))
    assert(r(("B", "2020-01-03")).contains(1.333333))
  }

  test("candlesticks: one label per bar in priority order, plain bars absent") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      // (day, open, high, low, close) — see expected labels below
      (1, 11.0, 11.2, 9.9, 10.0), // plain red bar (engulf anchor)
      (2, 9.9, 11.3, 9.8, 11.2), // engulfs day 1 → bullish_engulfing
      (3, 10.0, 10.6, 8.0, 10.5), // long lower shadow → hammer
      (4, 10.4, 12.5, 9.9, 10.0), // long upper shadow → shooting_star
      (5, 10.0, 11.0, 9.5, 10.05), // tiny body vs range → doji
      (6, 10.0, 11.5, 9.8, 11.0)) // nothing
      .map { case (d, o, h, l, c) =>
        ("A", java.sql.Date.valueOf(f"2020-01-$d%02d"), o, h, l, c) }
      .toDF("symbol", "date", "open", "high", "low", "close")
    val r = IndicatorsExt.candlestickPatterns(rows).collect()
      .map(x => x.getAs[java.sql.Date]("date").toString -> x.getAs[String]("pattern"))
    assert(r.toSeq == Seq(
      "2020-01-02" -> "bullish_engulfing", "2020-01-03" -> "hammer",
      "2020-01-04" -> "shooting_star", "2020-01-05" -> "doji"))
  }

  test("return ACF: alternating ±10% returns give -1/+1/-1 at lags 1/2/3") {
    // closes → rounded returns exactly +10,-10,+10,-10,+10
    val df = IndicatorsExt.returnAcf(
      bars("A", Seq(100.0, 110.0, 99.0, 108.9, 98.01, 107.811)), maxLag = 5)
    val rows = df.collect()
    assert(rows.length == 5)
    val byLag = rows.map(r => r.getAs[Int]("lag") -> r).toMap
    assert(byLag(1).getAs[Long]("n_pairs") == 4L)
    assert(byLag(1).getAs[Double]("acf") == -1.0)
    assert(byLag(2).getAs[Double]("acf") == 1.0)
    assert(byLag(3).getAs[Double]("acf") == -1.0)
    // lag 4: one pair → zero variance → null; lag 5: no pairs → null
    assert(byLag(4).getAs[Long]("n_pairs") == 1L)
    assert(byLag(4).isNullAt(byLag(4).fieldIndex("acf")))
    assert(byLag(5).getAs[Long]("n_pairs") == 0L)
    assert(byLag(5).isNullAt(byLag(5).fieldIndex("acf")))
  }

  test("beta against the equal-weight market recovers the return multiple") {
    // B's returns are exactly 2x A's → market = 1.5x A's returns,
    // beta_A = 1/1.5, beta_B = 2/1.5, both alphas 0
    val df = IndicatorsExt.betaVsMarket(
      bars("A", Seq(100.0, 110.0, 99.0)).unionByName(bars("B", Seq(100.0, 120.0, 96.0))))
    val rows = df.orderBy("symbol").collect()
    assert(rows.map(_.getAs[Long]("n_days")).toSeq == Seq(2L, 2L))
    assert(rows.map(_.getAs[Double]("beta")).toSeq == Seq(0.666667, 1.333333))
    assert(rows.map(_.getAs[Double]("alpha")).toSeq == Seq(0.0, 0.0))
  }
}
