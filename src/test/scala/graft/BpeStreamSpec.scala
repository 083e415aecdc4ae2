package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Sink
import graft.streaming.BpeStream

/** Streaming extension of the stored BPE tokenizer
  * ([[graft.streaming.BpeStream]]): the replayed merge table must
  * equal sequential batch extends in drop order.
  */
class BpeStreamSpec extends SparkSpec {

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("iter").collect().map(r => (r.getInt(0), r.getInt(1),
      r.getInt(2), r.getString(3), r.getString(4), r.getString(5),
      r.getLong(6))).toSeq

  test("streamed extends equal sequential batch extends in drop order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = docs.filter(col("doc_id") < 30)
    val b1 = docs.filter(col("doc_id") >= 30 && col("doc_id") < 40)
    val b2 = docs.filter(col("doc_id") >= 40 && col("doc_id") < 50)
    // sequential batch form
    val batchDir = Files.createTempDirectory("graft-bpestream-batch")
      .toString + "/tok"
    Sink.writeBpeTokenizer(base, batchDir, rounds = 2, batchSize = 3)
    Sink.extendBpeTokenizer(b1, batchDir, rounds = 1, batchSize = 3)
    Sink.extendBpeTokenizer(b2, batchDir, rounds = 1, batchSize = 3)
    val expected = mergeRows(Sink.loadBpeMerges(spark, batchDir))
    // streamed form: same batches as mtime-ordered drops
    val root = Files.createTempDirectory("graft-bpestream").toString
    Sink.writeBpeTokenizer(base, s"$root/tok", rounds = 2, batchSize = 3)
    Seq(("a", b1, 0), ("b", b2, 1)).foreach { case (tag, df, k) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$root/drops/drop=$tag")
      new java.io.File(s"$root/drops/drop=$tag").listFiles()
        .foreach(f => assert(f.setLastModified(1700000000000L + k * 60000L)))
    }
    BpeStream.runExtendReplay(spark, s"$root/drops/drop=*",
      s"$root/tok", s"$root/ckpt", rounds = 1, batchSize = 3)
    val got = mergeRows(Sink.loadBpeMerges(spark, s"$root/tok"))
    assert(got == expected)
    // the stream genuinely extended: later drops' rounds are present
    assert(got.map(_._2).distinct.size >= 2,
      s"expected merges from more than one training phase: $got")
  }
}
