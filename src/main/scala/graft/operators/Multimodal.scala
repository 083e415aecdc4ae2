package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns
  * with typed metadata, decode/feature-extract as a partition-mapped
  * stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[Multimodal.stubDecode]]) — what
  * is real and tested is the Spark-side shape a production pipeline
  * needs: a binary column + metadata travelling together in a typed
  * Dataset, a mapPartitions feature stage (one codec/model handle per
  * partition, not per row — the same batching contract a Pandas-UDF /
  * mapInPandas stage has in PySpark), and partitioning that keeps
  * payloads spread by id.
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

  /** Extracted features (the small side that flows downstream). */
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, preview: String)

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

  /** STUB decode — a real pipeline would open a codec here (one per
    * partition, reused across rows). Deterministic fake: dimensions
    * derived from the byte length, checksum = md5 hex, preview = first
    * 16 bytes as UTF-8. Replace the body to integrate a real codec.
    */
  def stubDecode(r: MediaRecord, md: java.security.MessageDigest): MediaFeatures = {
    md.reset()
    val checksum = md.digest(r.media).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = r.doc_id,
      kind = r.kind,
      n_bytes = r.media.length.toLong,
      checksum = checksum,
      width = (r.media.length % 640).toInt,
      height = (r.media.length % 480).toInt,
      preview = new String(r.media.take(16), java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The partition-mapped feature stage: per-partition codec handle
    * (here a MessageDigest), rows streamed through it.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(r => stubDecode(r, md))
    }
  }

  /** End-to-end: documents → media table → feature extraction. */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(mediaTable(docs)).toDF().orderBy("doc_id")
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
