package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Stateful streaming indicators — the EWM recursion carried across
  * micro-batches with `flatMapGroupsWithState` per symbol.
  *
  * The pandas adjust=True EWM is a linear recursion
  * (num ← x + (1-α)·num, den ← 1 + (1-α)·den, ema = num/den — same
  * algebra as graft.functions.EwmMean), so its whole history compresses
  * into two doubles of keyed state: a live feed needs O(symbols) state
  * regardless of stream length, and a bounded replay over stored files
  * reproduces the batch window results exactly
  * (IndicatorStreamSpec proves equality with Indicators.withEmaMacd).
  * Rows are sorted by date within each (batch, symbol) group; feed
  * order across batches must be chronological, which a date-ordered
  * file drop (or any watermark-ordered source) provides.
  */
object IndicatorStream {

  case class Bar(symbol: String, date: java.sql.Date, close: Double)
  case class EwmState(num: Double, den: Double)
  case class EmaOut(symbol: String, date: java.sql.Date, close: Double, ema: Double)

  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("date", DateType),
    StructField("close", DoubleType)))

  /** readStream over a parquet directory of (symbol, date, close) bars,
    * one file per trigger so state crosses batch boundaries.
    */
  def read(spark: SparkSession, dir: String): Dataset[Bar] = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[Bar]
  }

  /** Per-symbol streaming EMA with persistent (num, den) state. */
  def emaStream(stream: Dataset[Bar], span: Int): Dataset[EmaOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    require(span >= 1, s"span must be >= 1, got $span")
    val decay = 1.0 - 2.0 / (span + 1.0)
    stream.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[Bar], state: GroupState[EwmState]) =>
          var (num, den) = state.getOption
            .map(s => (s.num, s.den)).getOrElse((0.0, 0.0))
          val out = rows.toSeq.sortBy(_.date.getTime).map { b =>
            num = b.close + decay * num
            den = 1.0 + decay * den
            EmaOut(symbol, b.date, b.close, num / den)
          }
          state.update(EwmState(num, den))
          out.iterator
      }
  }

  /** Stamp batch-drop directories with explicit ascending mtimes
    * (fixed epoch, one minute apart, in list order). FileStreamSource
    * orders drops by modification time; stamping makes chronological
    * order independent of write latency and filesystem mtime
    * granularity. Shared by the replay query and its spec so the two
    * can never drift.
    */
  def stampDropOrder(baseDir: String, batches: Seq[String]): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      val t = java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(baseDir, s"batch=$b"))
      try walk.forEach(f => java.nio.file.Files.setLastModifiedTime(f, t))
      finally walk.close()
    }

  /** Bounded run into a memory sink (specs). */
  def runBounded(spark: SparkSession, dir: String, span: Int,
      name: String = "ema_stream"): String = {
    val q = emaStream(read(spark, dir), span)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
