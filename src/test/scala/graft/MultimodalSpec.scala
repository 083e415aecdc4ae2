package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload + metadata through the
  * mapPartitions feature stage. Image decode is REAL (javax.imageio
  * round trip over synthetic PNGs); audio/video decode is the
  * documented deterministic stub.
  */
class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (i, t) => (i, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("feature extraction: real PNG decode for images, stub for audio/video") {
    val d = docs(0L -> "hello world", 1L -> "spark", 2L -> "abc", 33L -> "img2")
    val f = Multimodal.features(d).collect()
    assert(f.length == 4)
    val r0 = f(0)
    assert(r0.getAs[String]("kind") == "image") // doc_id 0 % 3
    assert(f(1).getAs[String]("kind") == "audio")
    assert(f(2).getAs[String]("kind") == "video")
    // image row: width/height/pixel are DECODED from the PNG bytes and
    // must equal the generation functions — the real round trip
    assert(r0.getAs[Int]("width") == Multimodal.imageWidth(0L))
    assert(r0.getAs[Int]("height") == Multimodal.imageHeight(0L))
    assert((r0.getAs[Int]("px_r"), r0.getAs[Int]("px_g"), r0.getAs[Int]("px_b")) ==
      Multimodal.imageRgb(0L))
    val r33 = f(3)
    assert(r33.getAs[Int]("width") == 16 + 33 % 48)
    assert(r33.getAs[Int]("height") == 16 + (33 * 7) % 32)
    assert((r33.getAs[Int]("px_r"), r33.getAs[Int]("px_g"), r33.getAs[Int]("px_b")) ==
      ((33 % 256, 99 % 256, 165 % 256)))
    // image payload really is a PNG: signature bytes + checksum = md5 of
    // the encoded payload, deterministic across encodes
    val png = Multimodal.syntheticPng(0L)
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(r0.getAs[Long]("n_bytes") == png.length.toLong)
    val mdd = java.security.MessageDigest.getInstance("MD5")
    assert(r0.getAs[String]("checksum") ==
      mdd.digest(png).map("%02x".format(_)).mkString)
    // audio row: stand-in payload, stub dims, null pixels
    val r1 = f(1)
    assert(r1.getAs[Long]("n_bytes") == 5L)
    assert(r1.getAs[String]("preview") == "spark")
    val expected = d.filter(col("doc_id") === 1)
      .select(md5(col("text").cast("binary"))).head.getString(0)
    assert(r1.getAs[String]("checksum") == expected)
    assert(r1.getAs[Int]("width") == 5 % 640)
    assert(r1.getAs[Int]("height") == 5 % 480)
    assert(r1.isNullAt(r1.fieldIndex("px_r")) && r1.isNullAt(r1.fieldIndex("px_b")))
  }

  test("decode rejects a non-PNG image payload gracefully (stub fallback, null pixels)") {
    val bogus = Multimodal.MediaRecord(9L, "image", "not a png".getBytes("UTF-8"))
    val mdd = java.security.MessageDigest.getInstance("MD5")
    val r = Multimodal.decode(bogus, mdd)
    assert(r.width == 9 % 640 && r.height == 9 % 480)
    assert(r.px_r.isEmpty && r.px_g.isEmpty && r.px_b.isEmpty)
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

  test("WAV encode→parse round trip recovers the generation parameters") {
    for (docId <- Seq(1L, 4L, 7L, 10L, 30001L)) {
      val bytes = Multimodal.syntheticWav(docId)
      val parsed = Multimodal.parseWav(bytes)
      assert(parsed.isDefined, s"doc $docId failed to parse")
      val f = parsed.get
      assert(f.sample_rate == Multimodal.audioSampleRate(docId))
      assert(f.n_channels == Multimodal.audioChannels(docId))
      assert(f.bits_per_sample == 16)
      assert(f.n_samples == Multimodal.audioSamples(docId))
      assert(f.duration_us ==
        f.n_samples.toLong * 1000000L / f.sample_rate)
      assert(f.n_bytes == bytes.length.toLong)
    }
  }

  test("parseWav rejects non-WAV payloads") {
    assert(Multimodal.parseWav("not a wav at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseWav(Array.emptyByteArray).isEmpty)
    // RIFF magic but truncated body
    assert(Multimodal.parseWav("RIFF0000WAVE".getBytes("US-ASCII")).isEmpty)
    // a PNG is not a WAV
    assert(Multimodal.parseWav(Multimodal.syntheticPng(3L)).isEmpty)
  }

  test("GIF encode→parse round trip recovers the generation parameters") {
    for (docId <- Seq(2L, 5L, 11L, 14L, 30002L)) {
      val bytes = Multimodal.syntheticGif(docId)
      val parsed = Multimodal.parseGif(bytes)
      assert(parsed.isDefined, s"doc $docId failed to parse")
      val f = parsed.get
      assert(f.width == Multimodal.videoWidth(docId))
      assert(f.height == Multimodal.videoHeight(docId))
      assert(f.n_frames == Multimodal.videoFrames(docId))
      assert(f.duration_us ==
        f.n_frames.toLong * Multimodal.videoDelayCs(docId) * 10000L)
    }
  }

  test("syntheticGif is a VALID animated GIF: ImageIO decodes every frame") {
    // independent decoder cross-check — proves the hand-rolled LZW and
    // block structure are honest GIF, not merely self-consistent
    val docId = 5L
    val bytes = Multimodal.syntheticGif(docId)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == Multimodal.videoFrames(docId))
    val img = reader.read(0)
    assert(img.getWidth == Multimodal.videoWidth(docId))
    assert(img.getHeight == Multimodal.videoHeight(docId))
    reader.dispose()
  }

  test("parseGif rejects non-GIF and truncated payloads") {
    assert(Multimodal.parseGif("not a gif".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseGif(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseGif(Multimodal.syntheticPng(3L)).isEmpty)
    assert(Multimodal.parseGif(Multimodal.syntheticWav(3L)).isEmpty)
    // structurally truncated: cut mid-frame, no trailer reachable
    val whole = Multimodal.syntheticGif(7L)
    assert(Multimodal.parseGif(whole.take(whole.length / 2)).isEmpty)
    // magic but nothing else
    assert(Multimodal.parseGif("GIF89a".getBytes("US-ASCII")).isEmpty)
  }

  test("parseWav returns None (never throws) on adversarial headers") {
    // fractional-byte bits_per_sample: bits=4 passes a bits>0 check but
    // makes ch*(bits/8) == 0 — must be None, not ArithmeticException
    val fractional = Multimodal.syntheticWav(1L).clone()
    val bb = java.nio.ByteBuffer.wrap(fractional)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(34, 4.toShort) // fmt_ bits_per_sample field
    assert(Multimodal.parseWav(fractional).isEmpty)
    // chunk size near Int.MaxValue: off+8+size wraps negative in Int
    // math — must be None, not an index exception on a negative offset
    val overflow = Multimodal.syntheticWav(1L).clone()
    java.nio.ByteBuffer.wrap(overflow)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, Int.MaxValue - 4) // fmt chunk's declared size
    assert(Multimodal.parseWav(overflow).isEmpty)
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
