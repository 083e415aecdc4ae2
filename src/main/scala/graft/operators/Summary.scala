package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-symbol performance summary (SURVEY.md §2.4, A4–A10) — reference:
  * /root/reference/analyze_visualize.py:234-300
  * (`generate_performance_summary`).
  *
  * One window pass (daily returns) followed by one groupBy(symbol)
  * aggregation. first/last prices use min_by/max_by on date — order-safe
  * under any partitioning, unlike bare first()/last(). The Sharpe ratio
  * reproduces the reference literally: `(avg·√252)/(σ·√252)` — the √252
  * cancels, value ≡ avg/σ (analyze_visualize.py:278-280).
  */
object Summary {

  def performance(stocks: DataFrame): DataFrame = {
    val withRet = stocks.withColumn("daily_return", Indicators.dailyReturn)
    withRet.groupBy("symbol")
      .agg(
        count(lit(1)).as("trading_days"), // A4 :248
        max(col("high")).as("period_high"), // A5 :246
        min(col("low")).as("period_low"), // A5 :247
        min_by(col("close"), col("date")).as("first_close"), // A8 :253
        max_by(col("close"), col("date")).as("last_close"), // A8 :254
        avg(col("daily_return")).as("avg_daily_return"), // A6 :266
        stddev_samp(col("daily_return")).as("return_volatility"), // A7 :267
        max(col("volume")).as("max_volume")) // A5 :284
      .withColumn("total_return_pct", // A9 :255
        round((col("last_close") - col("first_close")) / col("first_close") * 100.0, 4))
      .withColumn("sharpe", // A10 :278-280
        when(col("return_volatility") > 0,
          round(col("avg_daily_return") / col("return_volatility"), 4)))
      .withColumn("avg_daily_return", round(col("avg_daily_return"), 4))
      .withColumn("return_volatility", round(col("return_volatility"), 4))
      // 6-row output: single-partition sort, not a range sort (whose
      // boundary sampling would re-run the window + aggregate subtree).
      .repartition(1).sortWithinPartitions("symbol")
  }
}
