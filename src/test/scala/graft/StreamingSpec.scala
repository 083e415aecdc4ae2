package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Structured Streaming spec: a bounded (AvailableNow) run of the
  * watermarked hourly aggregation over the static sf0.001 events must
  * equal the batch twin (EventsOps.hourly shape) on the same data —
  * the streaming/batch unification contract.
  */
class StreamingSpec extends SparkSpec {

  test("read starts on an empty directory and picks up files that arrive later") {
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft-stream-empty")
    // empty at stream declaration: schema inference is impossible, the
    // canonical-schema fallback must let the stream START anyway
    val stream = EventStream.read(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.contains("ts"))
    // a file lands after the stream was declared; a bounded run now
    // must process it through the same declared schema
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.hourlyAgg(stream)
      .writeStream.format("memory").queryName("empty_start_spec")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("empty_start_spec").count() > 0)
  }

  test("bounded stream run equals the batch hourly aggregate") {
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft-stream-events")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val name = EventStream.runBounded(spark, dir.toString, "hourly_stream_spec")
    val streamed = spark.table(name)
      .select("hour", "event_type", "n_events", "value_sum")
      .orderBy("hour", "event_type")
      .collect()

    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("value_sum"))
      .orderBy("hour", "event_type")
      .collect()

    assert(streamed.length == batch.length)
    assert(streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }
}
