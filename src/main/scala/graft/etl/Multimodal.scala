package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns plus typed metadata, with
  * decode/feature-extract/resize/frame-sample operators.
  *
  * The container has no image/audio codecs, so [[DecodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE — it derives "decoded" fields
  * from the raw bytes (lengths, byte slices, md5) so tests are exact.
  * Everything around it is the real plumbing a production decoder
  * drops into:
  *  - media rows are (id, kind, bytes, meta) with explicit schema;
  *  - bulk decode runs partition-wise ([[decodeBatch]] via
  *    `mapPartitions`) so a real decoder amortizes codec init per
  *    partition — the JVM analog of `mapInPandas` batch shape;
  *  - light-weight byte ops (frame sampling, truncating "resize")
  *    stay pure column expressions so they pushdown/codegen.
  *
  * Scale notes: binary payloads make rows wide — partition sizing
  * must come from `spark.sql.files.maxPartitionBytes`, and decode
  * output should be column-pruned before any shuffle (never shuffle
  * raw bytes unless the next operator needs them).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("declared_lang", StringType),
      StructField("origin", StringType))))))

  /** Adapt the `documents` table into a media table: UTF-8 bytes are
    * the opaque payload (the test stand-in for an image/audio blob). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang").as("declared_lang"),
        col("source").as("origin")).as("meta"))

  /** Decoded-media record (what a real image decode would yield). */
  final case class Decoded(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, checksum: String)

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * codec (no codecs in this container). Width/height/frames are
    * derived from byte length; checksum is md5 of the payload. A real
    * implementation replaces ONLY this function body. */
  def decodeStub(mediaId: Long, kind: String, bytes: Array[Byte]): Decoded = {
    val n = bytes.length
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, n / math.max(1, width))
    val frames = 1 + n % 7
    val checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    Decoded(mediaId, kind, width, height, frames, checksum)
  }

  /** Partition-wise bulk decode: one codec context per partition,
    * rows streamed through it — the batch shape a real decoder needs.
    * Column-prunes to (id, kind, bytes) before the heavy stage. */
  def decodeBatch(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // codec init would happen HERE, once per partition
        rows.map { case (id, kind, bytes) => decodeStub(id, kind, bytes) }
      }
  }

  /** Frame-sample as a pure column expression: n evenly-strided byte
    * windows of `frameLen` from the payload (substring is 1-based;
    * windows stride across the blob). Output: array<binary>. */
  def frameSample(bytes: org.apache.spark.sql.Column, n: Int, frameLen: Int) = {
    val stride = greatest(
      ((length(bytes) - frameLen) / math.max(1, n - 1)).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)),
      i => bytes.substr(i * stride + 1, lit(frameLen)))
  }

  /** "Resize" stub: truncate the payload to `maxBytes` (a real
    * implementation re-encodes; the column-level contract — binary in,
    * smaller binary out — is identical). */
  def resizeStub(bytes: org.apache.spark.sql.Column, maxBytes: Int) =
    substring(bytes, 1, maxBytes)
}
