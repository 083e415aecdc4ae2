package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — the pandas `resample`/`asfreq` surface a
  * reference user reaches for next (reference scope:
  * /root/reference/analyze_visualize.py works on daily bars only).
  * Both operators are selection/integer aggregates over the one
  * (symbol, date) shuffle — no float accumulation, so results are
  * deterministic without rounding tricks.
  */
object Resample {

  /** Daily → weekly OHLCV bars: open = first open of the week, close =
    * last close, high/low = extremes, volume = exact long sum. Weeks
    * are Monday-truncated (`date_trunc('week', …)`, ISO). `min_by`/
    * `max_by` on the date are unambiguous (one row per trading day),
    * so every column is a selection or integer sum — one hash
    * aggregate keyed (symbol, week), partial-combined map-side.
    */
  def weekly(df: DataFrame): DataFrame =
    df.groupBy(col("symbol"),
        date_trunc("week", col("date")).cast("date").as("week"))
      .agg(
        min_by(col("open"), col("date")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("date")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_days"))
      .orderBy("symbol", "week")

  /** Daily → monthly OHLCV bars plus the month-over-month close return
    * (pandas `resample('ME')` + `pct_change`). Same selection/integer
    * shape as [[weekly]]; the return is the one float — a single
    * division on bit-identical closes, rounded to 4.
    */
  def monthly(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("month")
    df.groupBy(col("symbol"),
        date_trunc("month", col("date")).cast("date").as("month"))
      .agg(
        min_by(col("open"), col("date")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("date")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_days"))
      .withColumn("mom_return",
        round((col("close") / lag("close", 1).over(w) - lit(1.0)) * lit(100.0), 4))
      .orderBy("symbol", "month")
  }

  /** Reindex each symbol to its full daily calendar and forward-fill
    * the close (pandas `asfreq('D').ffill()`): per-symbol min/max date
    * bounds generate the calendar (`sequence` — a narrow explode, no
    * shuffle beyond the bounds aggregate), a left join marks gaps, and
    * one ordered window carries the last seen close forward. At 100 TB
    * the calendar side is tiny (symbols × days) and the join key
    * (symbol, date) matches the natural bucketing of the bars table.
    */
  def ffillCalendar(df: DataFrame): DataFrame = {
    val bounds = df.groupBy("symbol")
      .agg(min("date").as("d0"), max("date").as("d1"))
    val cal = bounds.select(col("symbol"),
      explode(sequence(col("d0"), col("d1"))).as("date"))
    val w = Window.partitionBy("symbol").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.join(df.select("symbol", "date", "close"), Seq("symbol", "date"), "left")
      .withColumn("close_ffill", last(col("close"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("close").isNull)
      .select("symbol", "date", "close_ffill", "is_gap")
      .orderBy("symbol", "date")
  }
}
