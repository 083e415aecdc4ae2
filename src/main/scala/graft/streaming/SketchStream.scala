package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.operators.Sketch

/** Streaming accumulation of the log-bucket quantile histogram — the
  * ingest-time twin of [[graft.operators.Sketch.logHistQuantiles]]'s
  * register build: rows land in file drops, each micro-batch bucketizes
  * its slice with the same narrow (sh, lo) projection, and Structured
  * Streaming's aggregation state IS the register file, updated
  * incrementally across batches. Because registers merge by plain sum,
  * the final state equals the batch histogram regardless of how rows
  * were split into drops — the mergeability property, exercised live.
  *
  * State at 100 TB: one entry per occupied bucket (≤ 64·2^subBits
  * cells) in the state store — fixed-size however large the stream,
  * which is exactly why this sketch is the streaming quantile path.
  */
object SketchStream {

  val schema: StructType = StructType(Seq(
    StructField("l_extendedprice", DoubleType),
    StructField("l_returnflag", StringType)))

  /** readStream over a parquet drop directory of (price, flag) rows. */
  def read(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** The streaming register build: narrow bucketize projection, then a
    * stateful groupBy(lo, sh) count (Complete mode — the register file
    * is the small result; at scale one would checkpoint it per trigger
    * to a keyed sink instead).
    */
  def registers(stream: DataFrame, subBits: Int = 4): DataFrame =
    Sketch.bucketize(Sketch.centsBase(stream), subBits)
      .groupBy("lo", "sh").agg(count(lit(1)).as("cnt"))

  /** Bounded replay (specs + oracle query): process every drop, then
    * return the memory-sink table name holding the final register file.
    */
  def runBounded(spark: SparkSession, dir: String,
      name: String = "hist_stream", maxFilesPerTrigger: Int = 1): String = {
    val q = registers(read(spark, dir, maxFilesPerTrigger))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }

  val groupSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** The per-group streaming register build — the per-tenant latency
    * dashboard shape: one (lo, sh) register file PER event_type in the
    * aggregation state, groups × ≤ 64·2^subBits cells of state total
    * however large the stream.
    */
  def registersByType(stream: DataFrame, subBits: Int = 4): DataFrame =
    Sketch.groupRegisters(stream, subBits)

  /** Bounded per-group replay: process every (event_type, value) drop,
    * return the memory-sink table holding the per-group register file.
    */
  def runBoundedByType(spark: SparkSession, dir: String,
      name: String = "hist_stream_by_type", maxFilesPerTrigger: Int = 1): String = {
    val stream = spark.readStream
      .schema(groupSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    val q = registersByType(stream)
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
