package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming CUSUM monitoring — the deployment shape of
  * [[graft.operators.EventsOps.cusumBursts]]: the reference value k is
  * CALIBRATED on history (a batch aggregate, passed in as a small map)
  * and the live stream carries only the per-type recursion state
  * s_t = max(0, s_{t-1} + (n_t − k)) across micro-batches — O(1) state
  * per monitored type in the state store, exact LongType arithmetic.
  *
  * Within a micro-batch a type's events roll up to hourly counts
  * in-group (hours-per-batch is calendar-bounded) and the recursion
  * consumes hours in event-time order; replay drops are cut at day
  * boundaries so no hour straddles batches. With that alignment the
  * replay equals the batch operator row-for-row and shares its
  * recursive-CTE oracle verbatim.
  */
object CusumStream {

  case class EvRow(event_type: String, ts: java.sql.Timestamp)
  case class HourOut(event_type: String, hour: java.sql.Timestamp,
      n_events: Long, k: Long, cusum: Long, alarm: Boolean)
  case class CState(s: Long)

  private def floorHour(ts: java.sql.Timestamp): java.sql.Timestamp =
    new java.sql.Timestamp(ts.getTime - Math.floorMod(ts.getTime, 3600000L))

  /** readStream with the batch-probed schema (the
    * [[EventStream.read]] contract) but one file per trigger, so each
    * replay drop is its own micro-batch.
    */
  private def read(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir))

  /** Bounded replay into a memory sink; returns the collected monitor
    * rows ordered like the batch operator.
    */
  def runReplay(spark: SparkSession, dir: String, kMap: Map[String, Long],
      name: String = "cusum_stream"): DataFrame = {
    import spark.implicits._
    val q = read(spark, dir)
      .select(col("event_type"), col("ts")).as[EvRow]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[EvRow], state: GroupState[CState]) =>
          val k = kMap.getOrElse(key, 0L)
          var s = state.getOption.map(_.s).getOrElse(0L)
          val out = rows.toSeq.groupBy(r => floorHour(r.ts)).toSeq
            .sortBy(_._1.getTime)
            .map { case (h, rs) =>
              val n = rs.size.toLong
              s = math.max(0L, s + (n - k))
              HourOut(key, h, n, k, s, s >= 3 * k)
            }
          state.update(CState(s))
          out.iterator
      }
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select("event_type", "hour", "n_events", "k", "cusum", "alarm")
      .orderBy("event_type", "hour")
  }

  /** The batch-side k calibration: ⌈mean hourly count⌉ + 2 per type —
    * exactly [[graft.operators.EventsOps.cusumBursts]]' reference
    * table, collected (types-sized) for the stream.
    */
  def calibrateK(events: DataFrame): Map[String, Long] =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("event_type")
      .agg(expr("(sum(n_events) + count(*) - 1) div count(*) + 2").as("k"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("k"))
      .toMap
}
