package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.functions.EwmMean.ewm

/** Technical-indicator window operators (SURVEY.md §2.5, W1–W15) —
  * reference: /root/reference/analyze_visualize.py:98-141 and
  * /root/reference/dashboard.py:35-38.
  *
  * Every indicator is a window over `PARTITION BY symbol ORDER BY date`;
  * adding the symbol partition generalizes the reference's single-symbol
  * pandas frames to the whole table in one distributed pass. Catalyst
  * fuses all same-spec window expressions into a single WindowExec
  * (one shuffle on symbol + one sort per partition), so the full
  * indicator battery is two exchange-free window passes: pass 1 computes
  * everything over raw columns, pass 2 the indicators derived from
  * pass-1 outputs (MACD signal, volatility-of-returns).
  *
  * pandas null semantics reproduced exactly (SURVEY.md §2.5, verified
  * against pandas 2.2.2):
  *  - `rolling(n)` default `min_periods=n` → first n-1 outputs null
  *    ([[Indicators.gated]]);
  *  - `rolling(n, min_periods=1)` → no leading nulls (plain Spark window);
  *  - `.std()` is sample stddev (ddof=1) → `stddev_samp`;
  *  - `.diff()` / `.pct_change()` null on the first row (lag is null);
  *  - RSI's `delta.where(delta>0, 0)` turns the leading null delta into
  *    0.0 (NaN>0 is false in pandas) → `when(...).otherwise(0.0)`;
  *  - `ewm(span=s).mean()` is adjust=True (graft.functions.EwmMean).
  */
object Indicators {

  val w: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy("symbol").orderBy("date")

  private def trailing(n: Int) = w.rowsBetween(-(n - 1), 0)

  /** pandas `rolling(n)` default-min_periods gate: null until the window
    * holds n rows. `count` counts non-null `over` values; `close` is
    * never null in the derived table, so this counts frame rows.
    */
  def gated(n: Int, over: Column, agg: Column => Column): Column =
    gatedOver(w, n, over, agg)

  // ---- spec-parameterized twins: the same indicator formulas over a
  // caller-chosen window spec, so chunked evaluation (WindowChunks) can
  // run them at (key, chunk) parallelism with identical semantics.

  /** [[gated]] over an arbitrary spec. */
  def gatedOver(spec: WindowSpec, n: Int, over: Column, agg: Column => Column): Column = {
    val f = spec.rowsBetween(-(n - 1), 0)
    when(count(over).over(f) === n, agg(over).over(f))
  }

  /** [[dailyReturn]] over an arbitrary spec. */
  def dailyReturnOver(spec: WindowSpec, in: Column): Column =
    (in / lag(in, 1).over(spec) - lit(1.0)) * lit(100.0)

  /** [[rsi]] over an arbitrary spec — identical formula including the
    * null-delta → gain=loss=0.0 pandas quirk and the division edges.
    */
  def rsiOver(spec: WindowSpec, in: Column, n: Int): Column = {
    val f = spec.rowsBetween(-(n - 1), 0)
    val delta = in - lag(in, 1).over(spec)
    val gain = when(delta > 0, delta).otherwise(lit(0.0))
    val loss = when(delta < 0, -delta).otherwise(lit(0.0))
    // gain/loss are never null → count counts frame rows.
    val avgGain = when(count(in).over(f) === n, avg(gain).over(f))
    val avgLoss = when(count(in).over(f) === n, avg(loss).over(f))
    when(avgLoss > 0, lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))
      .when(avgLoss === 0 && avgGain > 0, lit(100.0))
      .otherwise(lit(null).cast("double"))
  }

  /** W1: SMA_n = close.rolling(n, min_periods=1).mean()
    * (analyze_visualize.py:106-108). */
  def sma(n: Int): Column = avg(col("close")).over(trailing(n))

  /** W2: MA_n = close.rolling(n).mean(), default min_periods → leading
    * nulls (dashboard.py:36-37). */
  def maGated(n: Int): Column = gated(n, col("close"), avg)

  /** W3: Volume_MA_20 (analyze_visualize.py:139). */
  def volumeMa(n: Int): Column = avg(col("volume")).over(trailing(n))

  /** W8: Bollinger middle/upper/lower (analyze_visualize.py:120-123).
    * Default min_periods and sample std. */
  def bollinger(n: Int = 20): Seq[(String, Column)] = {
    val mid = gated(n, col("close"), avg)
    val sd = gated(n, col("close"), stddev_samp)
    Seq(
      "bb_middle" -> mid,
      "bb_upper" -> (mid + lit(2.0) * sd),
      "bb_lower" -> (mid - lit(2.0) * sd))
  }

  /** W9: close.diff() — null on each symbol's first row
    * (analyze_visualize.py:126). */
  def diff: Column = col("close") - lag(col("close"), 1).over(w)

  /** W11: Daily_Return = close.pct_change()*100
    * (analyze_visualize.py:133). */
  def dailyReturn: Column =
    (col("close") / lag(col("close"), 1).over(w) - lit(1.0)) * lit(100.0)

  /** W10: RSI(14) (analyze_visualize.py:126-130). The leading null delta
    * becomes gain=loss=0.0 (pandas NaN>0 → False branch), so the first
    * RSI value appears at row n-1 (0-indexed row 13), not row n.
    * Division edges: loss=0 ∧ gain>0 → RSI=100 (pandas inf arithmetic);
    * loss=0 ∧ gain=0 → null (pandas 0/0 NaN).
    */
  def rsi(n: Int = 14): Column = rsiOver(w, col("close"), n)

  /** W12: Volatility_30d = Daily_Return.rolling(30).std(), default
    * min_periods, ddof=1 (analyze_visualize.py:136). The daily-return
    * column itself is null on each symbol's first row; pandas rolling
    * counts only non-null values toward min_periods, so the gate counts
    * the return column, not raw frame rows.
    */
  def volatility(n: Int = 30, returns: Column): Column =
    gatedOver(w, n, returns, stddev_samp)

  /** W13: normalize to base 100 from each symbol's first close
    * (analyze_visualize.py:314). */
  def normalizeBase100: Column =
    col("close") / first(col("close")).over(w.rowsBetween(Window.unboundedPreceding, 0)) * lit(100.0)

  /** W15: RSI threshold classification (analyze_visualize.py:295-300). */
  def rsiSignal(rsiCol: Column): Column =
    when(rsiCol > 70, "Overbought")
      .when(rsiCol < 30, "Oversold")
      .otherwise("Neutral")

  /** W4–W7: the EWM family — EMA_12/26, MACD, MACD_Signal, MACD_Histogram
    * (analyze_visualize.py:111-117). The signal line is an EWM *of the
    * MACD*, which is itself derived from two EWMs — two window passes
    * over the same (symbol, date) spec, no extra shuffle.
    */
  def withEmaMacd(df: DataFrame): DataFrame = {
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ema_12", ewm(col("close"), 12).over(running))
      .withColumn("ema_26", ewm(col("close"), 26).over(running))
      .withColumn("macd", col("ema_12") - col("ema_26"))
      .withColumn("macd_signal", ewm(col("macd"), 9).over(running))
      .withColumn("macd_histogram", col("macd") - col("macd_signal"))
  }

  /** E2's full indicator battery in one plan (analyze_visualize.py:98-141):
    * pass 1 = price/volume windows, pass 2 = derived windows.
    */
  def withAllIndicators(df: DataFrame): DataFrame = {
    val bb = bollinger(20)
    val pass1 = df
      .withColumn("sma_5", sma(5))
      .withColumn("sma_20", sma(20))
      .withColumn("sma_50", sma(50))
      .withColumn("volume_ma_20", volumeMa(20))
      .withColumn("bb_middle", bb(0)._2)
      .withColumn("bb_upper", bb(1)._2)
      .withColumn("bb_lower", bb(2)._2)
      .withColumn("rsi", rsi(14))
      .withColumn("daily_return", dailyReturn)
    val pass2 = pass1
      .withColumn("volatility_30d", volatility(30, col("daily_return")))
    withEmaMacd(pass2)
  }
}
