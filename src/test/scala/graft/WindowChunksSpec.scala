package graft

import org.apache.spark.sql.functions._
import graft.operators.{Indicators, WindowChunks}

/** Chunked window evaluation ≡ single-partition window evaluation —
  * bit-exact, including the min_periods gate across year boundaries —
  * while actually running at keys × chunks parallelism.
  */
class WindowChunksSpec extends SparkSpec {

  private lazy val stocks =
    Tables.stocks(spark, "/root/testdata/sf0.001")

  test("chunkedSmaGated equals the single-partition windows bit-exactly") {
    val chunked = WindowChunks
      .chunkedSmaGated(stocks, "symbol", "date", "close", smaN = 5, gatedN = 50)
      .select("symbol", "date", "sma", "ma_gated")
    val plain = stocks
      .withColumn("sma", Indicators.sma(5))
      .withColumn("ma_gated", Indicators.maGated(50))
      .select("symbol", "date", "sma", "ma_gated")
    // bit-exact: same frame rows in the same order on both plans
    assert(chunked.exceptAll(plain).isEmpty && plain.exceptAll(chunked).isEmpty)
    assert(chunked.count() == plain.count())
  }

  test("gate opens at the same global row even when the window spans a year boundary") {
    // a 50-row gated MA needs rows from the previous year for the first
    // 49 rows of each year; nulls must appear ONLY in each symbol's
    // global first 49 rows, not at every year start
    val chunked = WindowChunks
      .chunkedSmaGated(stocks, "symbol", "date", "close", smaN = 5, gatedN = 50)
    val nullsPerSymbol = chunked.filter(col("ma_gated").isNull)
      .groupBy("symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nullsPerSymbol.values.forall(_ == 49L), nullsPerSymbol.toString)
  }

  test("the window stage partitions on (key, chunk), not key alone") {
    val chunked = WindowChunks
      .chunkedSmaGated(stocks, "symbol", "date", "close", smaN = 5, gatedN = 50)
    val plan = chunked.queryExecution.executedPlan.toString
    // the Window operator and its exchange key on (symbol, __chunk):
    // keys × years groups, far above the one-task-per-symbol ceiling
    assert(plan.contains("__chunk"), plan.take(2000))
    val years = stocks.select(year(col("date"))).distinct().count()
    val groups = chunked.select(col("symbol"), year(col("date"))).distinct().count()
    assert(groups >= 6 * (years - 1), s"groups=$groups years=$years")
  }
}
