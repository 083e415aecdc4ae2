package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.streaming.DedupStream

/** Streaming exact dedup: feeding the same document file twice must
  * emit exactly one row per distinct content fingerprint — the
  * stateful-dedup contract a continuously-ingesting pipeline relies on.
  */
class DedupStreamSpec extends SparkSpec {

  test("re-ingested files dedup to one row per fingerprint") {
    val src = Paths.get("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-stream-docs")
    // the same content lands twice (two files) — a re-ingest
    Files.copy(src, dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val name = DedupStream.runBounded(spark, dir.toString, "dedup_stream_spec")
    val streamed = spark.table(name)

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val distinctFps = docs.select(md5(col("text")).as("fp")).distinct().count()

    assert(streamed.count() == distinctFps)
    assert(streamed.select("fp").distinct().count() == distinctFps)
    // the kept fingerprint set is exactly the corpus fingerprint set
    val kept = streamed.select("fp").collect().map(_.getString(0)).toSet
    val all = docs.select(md5(col("text")).as("fp")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept == all)
  }
}
