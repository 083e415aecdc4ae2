package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload + metadata through the
  * mapPartitions feature stage (decode is a deterministic stub — the
  * Spark-side schema/partitioning/batching is what is under test).
  */
class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t) => (i, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("feature extraction preserves rows and computes exact features") {
    val d = docs(0L -> "hello world", 1L -> "spark", 2L -> "abc")
    val f = Multimodal.features(d).collect()
    assert(f.length == 3)
    val r0 = f(0)
    assert(r0.getAs[String]("kind") == "image") // doc_id 0 % 3
    assert(f(1).getAs[String]("kind") == "audio")
    assert(f(2).getAs[String]("kind") == "video")
    assert(r0.getAs[Long]("n_bytes") == 11L)
    assert(r0.getAs[String]("preview") == "hello world")
    // checksum equals Spark's own md5 of the same bytes
    val expected = d.filter(col("doc_id") === 0)
      .select(md5(col("text").cast("binary"))).head.getString(0)
    assert(r0.getAs[String]("checksum") == expected)
    assert(r0.getAs[Int]("width") == 11 % 640)
    assert(r0.getAs[Int]("height") == 11 % 480)
  }

  test("media table keeps payload binary and id-partitionable") {
    val media = Multimodal.mediaTable(docs(7L -> "payload"))
    val rec = media.collect().head
    assert(rec.doc_id == 7L)
    assert(new String(rec.media, "UTF-8") == "payload")
  }

  test("resize stub shrinks proportionally and clamps upscales") {
    val rec = Multimodal.mediaTable(docs(0L -> ("x" * 640))).collect().head
    assert(Multimodal.resize(rec, 320, 480).media.length == 320)
    // upscale (incl. huge dims that would overflow naive int math)
    assert(Multimodal.resize(rec, 1280, 960).media.length == 640)
    assert(Multimodal.resize(rec, 65536, 65536).media.length == 640)
    val halved = Multimodal.resizeAll(
      Multimodal.mediaTable(docs(0L -> ("x" * 640))), 320, 480).collect().head
    assert(halved.media.length == 320)
  }

  test("frame sampling emits exactly n frames per record, empty included") {
    val media = Multimodal.mediaTable(
      docs(0L -> "abcdefghijklmnopqrstuvwxyz", 1L -> ""))
    val frames = Multimodal.sampleFrames(media, 3).collect()
    assert(frames.length == 6) // both records emit 3 frames
    val doc0 = frames.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.map(_._2).toSeq == Seq(0, 1, 2))
    assert(new String(doc0(0)._3, "UTF-8") == "abcdefgh")
    val doc1 = frames.filter(_._1 == 1L)
    assert(doc1.forall(_._3.isEmpty)) // empty payload → empty slices, rows kept
  }
}
