package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization — the custom-state counterpart of
  * the batch EventsOps.sessionize: gap-based sessions per user via
  * flatMapGroupsWithState with event-time timeout.
  *
  * State per user = the one open session (constant size); closed
  * sessions emit as soon as a later event proves the gap, and the open
  * session flushes when the event-time watermark passes its
  * gap-extended end (EventTimeTimeout). This is the canonical
  * bounded-state shape: watermark caps how long a session can stay
  * open, so state size is O(active users), never O(events).
  *
  * Sessions still open when a bounded input ends never time out (the
  * watermark stops at max(ts) − delay), so a bounded run emits every
  * session except possibly each user's last — asserted in the spec
  * against the batch sessionizer.
  */
object SessionStream {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** The open session's value sum is carried as an exact scaled long
    * (value rounded to 4dp × 10⁴, the same `Decimal(18,4)` view of a
    * double that Relational.moneySum takes), so the emitted sum is
    * bit-identical to the batch decimal sum regardless of arrival
    * order or batch boundaries.
    */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sumScaled: Long)
  case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, value_sum: Double)

  /** 4dp-scaled exact view of a value, matching Spark's
    * `cast(v as decimal(18,4))` (Double.toString-based BigDecimal,
    * HALF_UP).
    */
  private def scaled(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .movePointRight(4).longValueExact()

  /** Timestamp ⇄ exact microseconds: getTime is millis only — the µs
    * fraction is in getNanos.
    */
  private def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000)
    t.setNanos(((us % 1000000L) * 1000).toInt)
    t
  }

  private def out(uid: Long, s: OpenSession): SessionOut =
    SessionOut(uid, fromUs(s.startUs), fromUs(s.endUs), s.n, s.sumScaled / 10000.0)

  def sessionizer(gapMinutes: Int)(
      uid: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val gapUs = gapMinutes * 60000000L
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(out(uid, s))
    } else {
      val sorted = events.toSeq.sortBy(e => (toUs(e.ts), e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val us = toUs(e.ts)
        open match {
          case Some(s) if us - s.endUs <= gapUs =>
            open = Some(OpenSession(s.startUs, math.max(s.endUs, us), s.n + 1,
              s.sumScaled + scaled(e.value)))
          case Some(s) =>
            closed += out(uid, s)
            open = Some(OpenSession(us, us, 1, scaled(e.value)))
          case None =>
            open = Some(OpenSession(us, us, 1, scaled(e.value)))
        }
      }
      open.foreach { s =>
        state.update(s)
        // flush when the watermark passes the session's gap horizon
        state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60000L)
      }
      closed.result().iterator
    }
  }

  /** Watermarked stateful sessionization over the event stream. */
  def sessions(stream: Dataset[Ev], gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionizer(gapMinutes))
  }

  /** Replay run over ordered `batch=*` drops, one micro-batch per drop
    * (maxFilesPerTrigger=1 + mtime stamping), memory sink. The caller
    * plants far-future sentinel drops so the event-time watermark
    * passes every real session's gap horizon and the timeout path
    * flushes them — the bounded replay then emits EXACTLY the batch
    * sessionizer's output for real users (the sentinel user's sessions
    * are the caller's to filter).
    */
  def runReplay(spark: SparkSession, baseDir: String,
      name: String = "sessions_replay", gapMinutes: Int = 30): String = {
    import spark.implicits._
    val evs = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(baseDir + "/batch=*")
      .as[Ev]
    val q = sessions(evs, gapMinutes)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }

  /** Bounded run over a static events directory → memory sink. */
  def runBounded(spark: SparkSession, dir: String,
      name: String = "sessions_stream", gapMinutes: Int = 30): String = {
    import spark.implicits._
    val evs = EventStream.read(spark, dir)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val q = sessions(evs, gapMinutes)
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
