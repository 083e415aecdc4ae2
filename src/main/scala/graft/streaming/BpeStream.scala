package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

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
      rounds: Int = 1, batchSize: Int = 3): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(checkpointDir))
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(dropGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Sink
            .extendBpeTokenizer(batch, tokDir, rounds, batchSize)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
