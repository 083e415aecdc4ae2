package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming pipeline over the events table — the streaming
  * generalization of the reference's daily-batch incremental loop
  * (/root/reference/fetch_and_store_multi.py:269-330; SURVEY.md §2.7).
  *
  * Shape: file-source readStream → event-time watermark → tumbling
  * 1-hour window per event_type → append-mode sink. The aggregation
  * matches EventsOps.hourly, so a bounded run (Trigger.AvailableNow)
  * over a static directory must produce the same rows as the batch
  * query — that equivalence is the streaming spec's assertion.
  *
  * Scale notes: state is one aggregate buffer per (window, event_type);
  * the watermark bounds state retention, so long-running streams do not
  * accumulate state beyond late-data tolerance. maxFilesPerTrigger
  * bounds per-batch input at production scale.
  */
object EventStream {

  /** readStream over a parquet directory of events.
    *
    * Streaming sources require a user-declared schema, but the testdata's
    * `ts` physical encoding has changed across generations (INT64 nanos →
    * TIMESTAMP_MICROS/NTZ → TIMESTAMP). Hard-coding one encoding silently
    * corrupts timestamps when the files change, so we probe the actual
    * schema with a batch read (footer metadata only — no data scan) and
    * declare exactly what the files store, then apply the same
    * normalization as the batch loader ([[graft.Tables.normalizeEventTs]]).
    * Batch and stream therefore agree on `ts` for any encoding.
    */
  /** Canonical events schema — the schema-inference fallback for a
    * stream directory that is empty at start (files arriving later): a
    * batch probe cannot infer from zero footers, but a stream must
    * still be able to START and pick files up as they land. Matches the
    * current testdata encoding; an older nanos/NTZ drop landing later
    * would need the probe path (non-empty dir at start).
    */
  private val canonicalEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def read(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch {
        // 'Unable to infer schema' — empty or not-yet-populated
        // directory; declare the canonical schema so the stream starts
        // and picks up files as they arrive (the pre-probe behavior)
        case _: org.apache.spark.sql.AnalysisException => canonicalEventSchema
      }
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", 4)
        .parquet(dir))
  }

  /** Watermarked tumbling-hour aggregate (the streaming twin of
    * EventsOps.hourly).
    */
  def hourlyAgg(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), "1 hour").as("win"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("value_sum"))
      .select(
        col("win.start").as("hour"),
        col("event_type"), col("n_events"), col("value_sum"))

  /** APPEND-mode replay over ordered `batch=*` drops (one micro-batch
    * each): every window emits exactly once, when the event-time
    * watermark passes its close — the production sink semantics, not
    * Complete-mode re-emission. The caller plants far-future sentinel
    * drops so the watermark passes every real window before input ends;
    * sentinel rows are the caller's to filter.
    */
  def runReplayAppend(spark: SparkSession, baseDir: String,
      name: String = "events_hourly_replay"): String = {
    val evs = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(baseDir + "/batch=*")
    val q = hourlyAgg(evs)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }

  /** Bounded run to a memory sink: processes everything currently in
    * the directory (AvailableNow) and terminates. Complete mode so the
    * final windows — which the watermark has not yet closed when input
    * ends — are still emitted; a production append-mode sink would emit
    * each window once its watermark passes.
    */
  def runBounded(spark: SparkSession, dir: String, name: String = "events_hourly_stream"): String = {
    val q = hourlyAgg(read(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
