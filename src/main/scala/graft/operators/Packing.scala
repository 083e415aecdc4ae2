package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches — concat-then-chunk (the
  * GPT-style pretraining layout): documents concatenate in
  * deterministic doc_id order into one token stream that is cut into
  * fixed-capacity packs. Each document gets its global token offset,
  * its pack id, its position inside the pack, and whether it straddles
  * a pack boundary (the fraction a loader either splits or masks).
  *
  * Scale shape: the global offset is a prefix sum over a TOTAL order —
  * the naive `Window.orderBy(doc_id)` collapses to one partition and
  * dies at corpus scale. This runs the classic two-phase scan instead:
  * (1) an in-chunk running sum windowed by contiguous doc_id ranges
  * (keys × chunks parallelism — the same past-the-key-ceiling move as
  * WindowChunks), (2) per-chunk totals prefix-summed on a chunk-count-
  * sized frame (thousands of rows at 100 TB — the only single-partition
  * step, deliberately tiny) and broadcast back. Offsets are exact
  * BIGINT arithmetic end to end; pack assignment uses integer DIV, so
  * there is no float anywhere.
  */
object Packing {

  def packSequences(docs: DataFrame, tokens: Column, capacity: Long,
      chunkSize: Long = 1 << 20): DataFrame = {
    require(capacity > 0 && chunkSize > 0, "capacity and chunkSize must be positive")
    val base = docs.select(col("doc_id"), tokens.cast("long").as("tokens"))
      .withColumn("chunk", expr(s"doc_id DIV $chunkSize"))
    val inChunk = base.withColumn("cum",
      sum("tokens").over(Window.partitionBy("chunk").orderBy("doc_id")))
    // phase 2: chunk totals → exclusive prefix. One row per chunk — the
    // single-partition window is bounded by corpus_rows / chunkSize.
    val chunkOffsets = base.groupBy("chunk").agg(sum("tokens").as("chunk_sum"))
      .withColumn("chunk_offset", coalesce(
        sum("chunk_sum").over(
          Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("chunk", "chunk_offset")
    inChunk.join(broadcast(chunkOffsets), "chunk")
      .withColumn("tok_offset", col("chunk_offset") + col("cum") - col("tokens"))
      .withColumn("pack_id", expr(s"tok_offset DIV ${capacity}L"))
      .withColumn("pack_pos", pmod(col("tok_offset"), lit(capacity)))
      .withColumn("straddles", col("pack_pos") + col("tokens") > capacity)
      .select("doc_id", "tokens", "tok_offset", "pack_id", "pack_pos", "straddles")
      .orderBy("doc_id")
  }
}
