package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.IndicatorStream

/** Streaming EWM state: two chronological file drops (separate
  * micro-batches) must reproduce the batch window EMA exactly — the
  * (num, den) state carries the recursion across the batch boundary.
  */
class IndicatorStreamSpec extends SparkSpec {

  test("streamed EMA across two batches equals the batch window EMA") {
    val stocks = Tables.stocks(spark, "/root/testdata/sf0.001")
      .select("symbol", "date", "close")
    val cut = java.sql.Date.valueOf("1996-01-01")
    val dir = Files.createTempDirectory("graft-stream-ema").toString
    // chronological drops: early history first, then the rest; explicit
    // ascending mtimes (FileStreamSource orders by modification time)
    stocks.filter(col("date") < lit(cut)).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch=a")
    stocks.filter(col("date") >= lit(cut)).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch=b")
    IndicatorStream.stampDropOrder(dir, Seq("a", "b"))
    // the file source reads both subdirs; one file per trigger
    val name = IndicatorStream.runBounded(spark, dir + "/batch=*", span = 12,
      "ema_stream_spec")

    val streamed = spark.table(name)
      .select(col("symbol"), col("date"), col("ema").as("ema_stream"))
    val batch = graft.operators.Indicators.withEmaMacd(stocks)
      .select(col("symbol"), col("date"), col("ema_12"))
    val joined = streamed.join(batch, Seq("symbol", "date")).collect()
    assert(joined.length == stocks.count())
    joined.foreach { r =>
      val (s, b) = (r.getAs[Double]("ema_stream"), r.getAs[Double]("ema_12"))
      assert(math.abs(s - b) <= math.max(1e-9, math.abs(b) * 1e-12), r.toString)
    }
  }
}
