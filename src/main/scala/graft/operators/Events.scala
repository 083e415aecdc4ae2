package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch operators over the events table (ts, user_id, event_type,
  * value, props JSON) — the incremental/streaming-adjacent surface
  * (SURVEY.md §2.7). The hourly aggregate is the batch twin of the
  * Structured Streaming pipeline in graft.streaming.EventStream; both
  * share the same windowed semantics so the streaming output can be
  * verified against this query.
  */
object EventsOps {

  /** Tumbling-hour aggregate per event_type. Money-style exact sum via
    * decimal; distinct users exact.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Relational.moneySum(col("value")).as("value_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  /** JSON property extraction (props = {"k": int}) + per-type stats.
    * regexp-based so the oracle needs no JSON extension.
    */
  def propStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("k_sum"),
        round(avg("k"), 4).as("k_avg"),
        min("k").as("k_min"),
        max("k").as("k_max"))
      .orderBy("event_type")

  /** Sessionization: gap-based sessions per user (30-minute timeout) —
    * the classic incremental/stateful pattern expressed as windows:
    * session start = event whose gap from the previous event exceeds
    * the timeout; session id = running count of session starts.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_start")).over(byUser.rowsBetween(Long.MinValue, 0)))
    withGap.groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        Relational.moneySum(col("value")).as("value_sum"))
      .orderBy("user_id", "session_seq")
  }
}
