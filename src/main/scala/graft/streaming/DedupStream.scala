package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication over a document feed — the ingest-time
  * twin of [[graft.operators.Dedup.exact]]: a training-data pipeline
  * that continuously lands documents must drop re-ingested content
  * without re-scanning the corpus, which is Structured Streaming's
  * stateful `dropDuplicates` on a content fingerprint.
  *
  * Shape: file-source readStream → md5 fingerprint projection →
  * `dropDuplicatesWithinWatermark(fp)` keyed state. State is one entry
  * per distinct fingerprint inside the watermark horizon — the
  * watermark bounds state exactly like the reference's incremental
  * watermark bounds re-fetch (SURVEY.md §2.7), and re-ingests inside
  * the horizon dedup exactly. At 100 TB the fingerprint state lives in
  * the state store (RocksDB), sized by distinct-docs-per-horizon, not
  * corpus size.
  */
object DedupStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** readStream over a parquet directory of documents. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)

  /** Fingerprint + arrival-time projection, then stateful dedup: the
    * first document per fingerprint within the watermark passes, later
    * copies are dropped.
    */
  def dedup(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fp", md5(col("text")))
      .withColumn("arrival", current_timestamp())
      .withWatermark("arrival", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "fp", "lang")

  /** Bounded run into a memory sink (specs): process everything in the
    * directory, then stop.
    */
  def runBounded(spark: SparkSession, dir: String,
      name: String = "dedup_stream"): String = {
    val q = dedup(read(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    name
  }
}
