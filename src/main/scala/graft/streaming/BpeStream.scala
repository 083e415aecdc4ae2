package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming extension of the STORED BPE tokenizer
  * ([[graft.operators.Sink.writeBpeTokenizer]]) — the domain-shift leg
  * of the artifact lifecycle run from a feed: newly accepted document
  * batches land as file drops, and each micro-batch continues training
  * where the stored merge table left off
  * ([[graft.operators.Sink.extendBpeTokenizer]]). Micro-batches run
  * sequentially (AvailableNow, one drop per trigger), so the final
  * merge table equals the same extends issued as sequential batch
  * calls in drop order — which is what the multi-phase oracle chain
  * unrolls. Per-trigger cost is the extend cost: a merges-sized
  * artifact read + the batch-vocabulary count rounds; never a re-count
  * of the original training corpus.
  */
object BpeStream {

  /** Bounded replay (specs + the oracle-checked query): process every
    * drop under `dropGlob`, extending the tokenizer at `tokDir` by
    * `rounds` batched rounds per micro-batch, then stop.
    */
  def runExtendReplay(spark: SparkSession, dropGlob: String,
      tokDir: String, checkpointDir: String,
      rounds: Int = 1, batchSize: Int = 3): Unit =
    // re-apply window ([[Replay]]): a retried extend would append its
    // merges twice — the marker bounds that to a crash in the
    // marker-write instant, and a duplicated append is detectable
    // (iter collision in the merge table) rather than silent
    Replay.replayWith(spark, dropGlob, checkpointDir, Replay.docSchema) {
      (batch, _) =>
        graft.operators.Sink.extendBpeTokenizer(batch, tokDir, rounds,
          batchSize)
    }
}
