package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decode/feature-extract as a partition-mapped
  * stage.
  *
  * IMAGE decode is REAL: [[withRealImages]] encodes a deterministic
  * synthetic PNG per image-kind row (javax.imageio — pure JVM, no
  * container codecs needed) and [[extractFeatures]] decodes it back,
  * so width/height/top-left pixel are genuine decoder outputs — the
  * multimodal_features oracle checks the full encode→decode round trip
  * against the known generation functions. AUDIO decode is real at the
  * container level: [[syntheticWav]] emits honest 16-bit PCM RIFF/WAVE
  * and [[parseWav]] walks the chunk list for sample-rate / channels /
  * bits / frame count (multimodal_audio oracle-checks the round trip).
  * VIDEO decode is real at the container level too: [[syntheticGif]]
  * emits honest animated GIF89a (valid LZW — ImageIO decodes it, the
  * spec asserts so) and [[parseGif]] walks the block structure for
  * dimensions / frame count / duration (multimodal_video oracle-checks
  * the round trip). The remaining stubs are the generic resize /
  * frame-sample fakes on the stand-in payload path;
  * what is real and tested there is the Spark-side shape a production
  * pipeline needs: a binary column + metadata travelling together in a
  * typed Dataset, a mapPartitions feature stage (one codec/model
  * handle per partition, not per row — the same batching contract a
  * Pandas-UDF / mapInPandas stage has in PySpark), and partitioning
  * that keeps payloads spread by id.
  *
  * Scale notes: payload bytes dominate — never shuffle them through a
  * wide transform. The feature stage here is narrow (mapPartitions, no
  * shuffle); only the small extracted-feature rows move on. At 100 TB
  * the media column lives in its own parquet with a doc_id key and
  * features join back by id.
  */
object Multimodal {

  /** A media row: payload + metadata. The payload here is the UTF-8 of
    * the text column standing in for real image/audio bytes.
    */
  case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  /** Extracted features (the small side that flows downstream).
    * px_* are the decoded top-left pixel channels — None for non-image
    * rows and payloads the decoder rejects.
    */
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, checksum: String,
      width: Int, height: Int,
      px_r: Option[Int], px_g: Option[Int], px_b: Option[Int],
      preview: String)

  /** Deterministic synthetic-image parameters: dimensions and fill
    * color as pure functions of doc_id, mirrored in the
    * multimodal_features oracle SQL — the decoder recovering exactly
    * these values from the PNG bytes is what proves the decode real.
    */
  def imageWidth(docId: Long): Int = 16 + (docId % 48).toInt
  def imageHeight(docId: Long): Int = 16 + ((docId * 7) % 32).toInt
  def imageRgb(docId: Long): (Int, Int, Int) =
    ((docId % 256).toInt, ((docId * 3) % 256).toInt, ((docId * 5) % 256).toInt)

  /** Encode one synthetic PNG: solid fill at the doc's deterministic
    * dimensions/color. PNG is lossless RGB, so decode recovers the
    * exact channel values.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val (w, h) = (imageWidth(docId), imageHeight(docId))
    val (r, g, b) = imageRgb(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Build the media table from documents: binary payload + kind tag.
    * Spread (guarded — see [[Spread]]) so a one-file source's decode
    * stage isn't a single task; a real media table arrives as many
    * files and skips the shuffle.
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Spread.spread(docs).select(
        col("doc_id"),
        // deterministic kind assignment in lieu of a real mime sniff
        element_at(lit(Array("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** The encode side of the real-decode round trip: image-kind rows
    * get a genuine PNG payload ([[syntheticPng]]); audio/video keep
    * their stand-in bytes (no codecs in the container). Narrow map —
    * no shuffle, payload bytes stay where they are.
    */
  def withRealImages(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r =>
      if (r.kind == "image") r.copy(media = syntheticPng(r.doc_id)) else r)
  }

  /** Decode one record. Image rows decode FOR REAL through
    * javax.imageio — width/height/top-left pixel come from the decoded
    * raster; a payload ImageIO rejects (not actually an image) falls
    * back to the stub fields with null pixels. Audio/video decode is a
    * deterministic STUB (dimensions from byte length) — replace that
    * branch to integrate a real codec.
    */
  def decode(r: MediaRecord, md: java.security.MessageDigest): MediaFeatures = {
    md.reset()
    val checksum = md.digest(r.media).map("%02x".format(_)).mkString
    val decoded: Option[java.awt.image.BufferedImage] =
      if (r.kind == "image")
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media)))
      else None
    val (w, h) = decoded
      .map(img => (img.getWidth, img.getHeight))
      .getOrElse(((r.media.length % 640).toInt, (r.media.length % 480).toInt))
    val px = decoded.map(_.getRGB(0, 0))
    MediaFeatures(
      doc_id = r.doc_id,
      kind = r.kind,
      n_bytes = r.media.length.toLong,
      checksum = checksum,
      width = w,
      height = h,
      px_r = px.map(p => (p >> 16) & 0xff),
      px_g = px.map(p => (p >> 8) & 0xff),
      px_b = px.map(p => p & 0xff),
      preview = new String(r.media.take(16), java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The partition-mapped feature stage: per-partition codec handles
    * (a MessageDigest; ImageIO with its disk cache off), rows streamed
    * through them.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(r => decode(r, md))
    }
  }

  /** End-to-end: documents → media table → real PNG payloads for the
    * image rows → feature extraction (real decode for images).
    */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(withRealImages(mediaTable(docs))).toDF().orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // Audio: real RIFF/WAVE header codec (pure JVM, no container codecs) —
  // the audio twin of the ImageIO move. Synthetic-WAV parameters are
  // pure functions of doc_id, mirrored in the multimodal_audio oracle
  // SQL; the parser recovering exactly those values from the bytes is
  // what proves the decode real. Video decode remains the documented
  // stub (a real implementation needs a container demuxer).
  // ---------------------------------------------------------------------

  /** Deterministic synthetic-audio parameters (oracle-mirrored). */
  def audioSampleRate(docId: Long): Int =
    Array(8000, 16000, 22050, 44100)((docId % 4).toInt)
  def audioChannels(docId: Long): Int = 1 + (docId % 2).toInt
  def audioSamples(docId: Long): Int = 100 + ((docId * 13) % 400).toInt

  /** Parsed WAV facts — everything the 44-byte canonical header plus
    * the data-chunk length determine. duration_us is exact integer
    * micros (frames * 1_000_000 / rate, floor division).
    */
  case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_channels: Int, bits_per_sample: Int,
      n_samples: Int, duration_us: Long, n_bytes: Long)

  /** Encode one canonical 16-bit PCM WAV: 12-byte RIFF header, 24-byte
    * fmt chunk, 8-byte data header, then little-endian samples. The
    * sample values are a deterministic sawtooth — irrelevant to the
    * header parse but they make the payload honest PCM.
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val rate = audioSampleRate(docId)
    val ch = audioChannels(docId)
    val frames = audioSamples(docId)
    val dataLen = frames * ch * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort)
      .putInt(rate)
      .putInt(rate * ch * 2) // byte rate
      .putShort((ch * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames * ch) {
      buf.putShort((((docId + i * 37) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Real WAV header parse: validate RIFF/WAVE magic, walk the chunk
    * list (word-aligned, per the RIFF spec), read fmt_ fields and the
    * data-chunk length. None for anything that is not a WAV — callers
    * fall back to the stub path, same contract as ImageIO returning
    * null for a non-image.
    */
  def parseWav(bytes: Array[Byte]): Option[AudioFeatures] = {
    if (bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    // chunk-walk offsets in LONG: a declared chunk size near
    // Int.MaxValue would wrap `off + 8 + size` negative in Int math,
    // slip past the bounds check, and turn a malformed input into an
    // executor exception instead of the contractual None
    var off = 12L
    var rate, ch, bits = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
      val id = fourcc(off.toInt)
      val size = buf.getInt(off.toInt + 4)
      if (size < 0 || off + 8 + size.toLong > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          ch = buf.getShort(off.toInt + 10).toInt
          rate = buf.getInt(off.toInt + 12)
          bits = buf.getShort(off.toInt + 22).toInt
        case "data" => dataLen = size
        case _ => ()
      }
      off += 8 + size.toLong + (size & 1) // chunks are word-aligned
    }
    // bits must be a positive whole number of bytes — 1..7 would make
    // the frame-size divisor zero (ArithmeticException, not None)
    if (rate <= 0 || ch <= 0 || bits < 8 || bits % 8 != 0 || dataLen < 0) None
    else {
      val frames = dataLen / (ch * (bits / 8))
      Some(AudioFeatures(0L, rate, ch, bits, frames,
        frames.toLong * 1000000L / rate, bytes.length.toLong))
    }
  }

  /** The encode side for audio rows: genuine WAV payloads (cf.
    * [[withRealImages]]). Narrow map, no shuffle.
    */
  def withRealAudio(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r =>
      if (r.kind == "audio") r.copy(media = syntheticWav(r.doc_id)) else r)
  }

  /** End-to-end audio: documents → media table → real WAV payloads →
    * header parse. Only audio-kind rows flow; the parse is a narrow
    * map (pure byte inspection — no per-partition handle needed).
    */
  def audioFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withRealAudio(mediaTable(docs))
      .filter(_.kind == "audio")
      .flatMap(r => parseWav(r.media).map(_.copy(doc_id = r.doc_id)))
      .toDF().orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // Video: real GIF container codec (pure JVM) — the video twin of the
  // PNG/WAV moves. The encoder emits honest GIF89a animations (valid
  // LZW image data — ImageIO can decode them, the spec asserts it);
  // the parser walks the real block structure (logical screen
  // descriptor, graphic-control extensions, image descriptors,
  // sub-block chains) and recovers dimensions, frame count, and total
  // duration from the BYTES. Parameters are pure functions of doc_id,
  // mirrored in the multimodal_video oracle SQL.
  // ---------------------------------------------------------------------

  /** Deterministic synthetic-video parameters (oracle-mirrored). */
  def videoWidth(docId: Long): Int = 8 + (docId % 24).toInt
  def videoHeight(docId: Long): Int = 8 + ((docId * 5) % 16).toInt
  def videoFrames(docId: Long): Int = 2 + ((docId * 11) % 14).toInt
  def videoDelayCs(docId: Long): Int = 4 + (docId % 12).toInt

  /** Parsed GIF facts — what the container structure alone determines
    * (no pixel decode): screen dimensions, image-descriptor count,
    * duration summed from the graphic-control delays (centiseconds →
    * exact micros).
    */
  case class VideoFeatures(doc_id: Long, width: Int, height: Int,
      n_frames: Int, duration_us: Long)

  /** Encode one animated GIF89a: 2-color global palette, a Netscape
    * loop extension, and per frame a graphic-control extension (the
    * frame delay) + full-screen image descriptor + genuine LZW pixel
    * data. The LZW stream is the standard "uncompressed" variant (a
    * CLEAR before every second literal keeps the code width at the
    * initial 3 bits — no dictionary growth to track) so any conforming
    * decoder reads it; frames alternate palette indices so the
    * animation is honest.
    */
  def syntheticGif(docId: Long): Array[Byte] = {
    val (w, h) = (videoWidth(docId), videoHeight(docId))
    val frames = videoFrames(docId)
    val delay = videoDelayCs(docId)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) } // little-endian
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    u8(0xf0) // GCT present, 8-bit color resolution, 2-entry table
    u8(0); u8(0) // background index, aspect
    val (r, g, b) = imageRgb(docId)
    u8(r); u8(g); u8(b) // palette 0
    u8(255 - r); u8(255 - g); u8(255 - b) // palette 1
    // Netscape looping application extension
    out.write(Array[Byte](0x21, 0xff.toByte, 11))
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 1, 0, 0, 0))
    for (f <- 0 until frames) {
      // graphic control extension: the per-frame delay
      out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0))
      u16(delay); u8(0); u8(0)
      // image descriptor: full screen, no local color table
      u8(0x2c); u16(0); u16(0); u16(w); u16(h); u8(0)
      u8(2) // LZW minimum code size (codes start 3 bits wide)
      // pixel stream: constant index f%2; CLEAR(4) every 2 literals
      // bounds the dictionary below 8 so the width never grows; EOI(5)
      val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
      var acc = 0L; var nAcc = 0
      def emit(code: Int): Unit = {
        acc |= (code.toLong & 0x7) << nAcc; nAcc += 3
        while (nAcc >= 8) { bits += (acc & 0xff).toByte; acc >>= 8; nAcc -= 8 }
      }
      val px = f % 2
      var j = 0
      while (j < w * h) {
        if (j % 2 == 0) emit(4) // CLEAR
        emit(px); j += 1
      }
      emit(5) // end of information
      if (nAcc > 0) bits += (acc & 0xff).toByte
      // sub-block framing: <=255-byte chunks, zero terminator
      var off = 0
      while (off < bits.length) {
        val n = math.min(255, bits.length - off)
        u8(n); out.write(bits.slice(off, off + n).toArray); off += n
      }
      u8(0)
    }
    u8(0x3b) // trailer
    out.toByteArray
  }

  /** Real GIF container parse: validate the GIF87a/GIF89a magic, read
    * the logical screen descriptor, then walk the block list — skip
    * color tables by their declared size, count image descriptors as
    * frames, sum graphic-control delays into the duration, and follow
    * every sub-block chain by its length bytes. None for anything that
    * is not a GIF or is structurally truncated (offsets tracked in
    * Long — a hostile length byte must not wrap the bounds math), same
    * contract as [[parseWav]].
    */
  def parseGif(bytes: Array[Byte]): Option[VideoFeatures] = {
    if (bytes.length < 13) return None
    val magic = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (magic != "GIF89a" && magic != "GIF87a") return None
    def u8(off: Long): Int = bytes(off.toInt) & 0xff
    def u16(off: Long): Int = u8(off) | (u8(off + 1) << 8)
    val (w, h) = (u16(6), u16(8))
    val packed = u8(10)
    var off: Long = 13L
    if ((packed & 0x80) != 0) off += 3L << ((packed & 0x07) + 1) // global color table
    var frames = 0
    var delayCs = 0L
    def skipSubBlocks(): Boolean = {
      while (off < bytes.length && u8(off) != 0) {
        off += 1 + u8(off)
      }
      if (off >= bytes.length) false else { off += 1; true } // the 0 terminator
    }
    while (off < bytes.length) {
      u8(off) match {
        case 0x3b => // trailer: a well-formed GIF ends here
          return if (frames > 0 && w > 0 && h > 0)
            Some(VideoFeatures(0L, w, h, frames, delayCs * 10000L)) else None
        case 0x2c => // image descriptor = one frame
          if (off + 10 > bytes.length) return None
          val ipacked = u8(off + 9)
          off += 10
          if ((ipacked & 0x80) != 0) off += 3L << ((ipacked & 0x07) + 1)
          off += 1 // LZW minimum code size
          if (off > bytes.length || !skipSubBlocks()) return None
          frames += 1
        case 0x21 => // extension: label byte then sub-blocks
          if (off + 2 > bytes.length) return None
          val label = u8(off + 1)
          off += 2
          if (label == 0xf9 && off + 4 < bytes.length && u8(off) == 4)
            delayCs += u16(off + 2) // graphic control: delay field
          if (!skipSubBlocks()) return None
        case _ => return None // not a legal top-level block
      }
    }
    None // ran off the end without a trailer
  }

  /** The encode side for video rows: genuine animated-GIF payloads
    * (cf. [[withRealImages]], [[withRealAudio]]). Narrow map.
    */
  def withRealVideo(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r =>
      if (r.kind == "video") r.copy(media = syntheticGif(r.doc_id)) else r)
  }

  /** End-to-end video: documents → media table → real GIF payloads →
    * container parse. Narrow map, only video-kind rows flow.
    */
  def videoFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withRealVideo(mediaTable(docs))
      .filter(_.kind == "video")
      .flatMap(r => parseGif(r.media).map(_.copy(doc_id = r.doc_id)))
      .toDF().orderBy("doc_id")
  }

  /** STUB resize — a real implementation decodes, scales, re-encodes.
    * Deterministic fake: truncate the payload by the target/reference
    * pixel ratio (capped at 1 — upscales keep the full payload).
    */
  def resize(r: MediaRecord, w: Int, h: Int): MediaRecord = {
    val ratio = math.min(1.0, w.toDouble * h / (640.0 * 480.0))
    val keep = math.max(1, (r.media.length * ratio).toInt).min(r.media.length)
    r.copy(media = r.media.take(keep))
  }

  /** Dataset-level resize stage (narrow map, no shuffle). */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(resize(_, w, h))
  }

  /** STUB frame sampling — a real implementation seeks keyframes.
    * Deterministic fake: n evenly-spaced 8-byte slices of the payload.
    * Every record emits exactly n frames (empty slices for payloads
    * shorter than the sample grid), so frames join back to their
    * source rows losslessly. The Spark-side shape (one row in → n
    * frame rows out, narrow flatMap, no shuffle) is the part that
    * matters at scale.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[(Long, Int, Array[Byte])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val len = r.media.length
      (0 until n).map { i =>
        val off = if (len == 0) 0 else (len.toLong * i / n).toInt
        (r.doc_id, i, r.media.slice(off, math.min(off + 8, len)))
      }
    }
  }
}
