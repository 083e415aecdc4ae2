package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.operators.EventsOps
import graft.streaming.SessionStream

/** Stateful streaming sessionization vs the batch sessionizer: every
  * emitted streamed session must exactly equal a batch session, and
  * only open-at-end-of-input sessions may be missing.
  */
class SessionStreamSpec extends SparkSpec {

  test("streamed sessions ⊆ batch sessions; near-complete emission") {
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft-session-events")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val name = SessionStream.runBounded(spark, dir.toString, "sessions_spec")
    val streamed = spark.table(name)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    val batch = EventsOps.sessionize(Tables.events(spark, "/root/testdata/sf0.001"), 30)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    assert(streamed.nonEmpty)
    val extras = streamed -- batch
    assert(extras.isEmpty, s"streamed sessions not in batch: ${extras.take(3)}")
    val missing = batch -- streamed
    // only sessions still open (or within the watermark horizon) at
    // end of input may be missing — bounded per user
    val users = batch.map(_._1)
    assert(missing.size <= 2 * users.size,
      s"${missing.size} missing of ${batch.size} (${users.size} users)")
    assert(streamed.size >= batch.size / 2)
  }
}
