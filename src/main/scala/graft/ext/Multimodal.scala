package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media (image/audio/video) carried as
  * opaque `binary` columns next to a typed metadata struct, processed
  * batch-wise per partition. The container has no image/audio codecs,
  * so the decode step is a clearly-marked deterministic fake —
  * everything Spark-side (schema, batching, partitioning, UDF
  * signature) is real and tested.
  *
  * At 100 TB the pattern is: media bytes in parquet binary columns
  * (or pointers to object-store blobs), metadata as a struct column;
  * decode/feature-extract runs inside `mapPartitions` so codec
  * contexts are initialized once per partition, never per row.
  */
object Multimodal {

  /** Build a media table from documents: payload = UTF-8 bytes of the
    * text standing in for an encoded media blob, plus typed metadata. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        struct(
          lit("image/fake").as("mime"),
          col("source").as("origin"),
          col("n_chars").cast("long").as("payload_hint")).as("meta"))

  /** Metadata/shape extraction over the binary payload — pure column
    * expressions (no decode): byte length, leading-bytes signature,
    * content hash. SQL-oracle-able. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"),
        length(col("payload")).as("n_bytes"),
        hex(substring(col("payload"), 1, 8)).as("magic_hex"),
        col("meta.mime").as("mime"),
        col("meta.origin").as("origin"))

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB DECODE: a real build would call an image codec here (e.g.
    * javax.imageio / ffmpeg) inside this per-partition loop. The fake
    * derives deterministic "dimensions" and a feature vector from the
    * bytes so tests are stable offline. */
  private def fakeDecode(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    val width = 64 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
    val height = 64 + (n % 64)
    val feature = Array.tabulate(8) { i =>
      (payload.iterator.zipWithIndex.filter(_._2 % 8 == i).map(_._1.toInt).sum % 997) / 997.0f
    }
    Row(id, width, height, feature)
  }

  /** Decode + feature-extract via mapPartitions: batch shape is
    * one-partition-at-a-time, codec context per partition. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    mediaTable(spark, dir)
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition "codec" init would go here
        rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** Frame-sample analog: slice the payload into fixed-size "frames"
    * and keep every k-th — pure column expressions over binary. The
    * slicing stays in BINARY the whole way (`substr` on a binary
    * column yields a binary slice, `length` counts bytes): a UTF-8
    * string cast would mangle real — non-text — media bytes the day
    * an actual blob arrives. */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 32,
      everyK: Int = 4): DataFrame =
    frameSampleOf(mediaTable(spark, dir), frameBytes, everyK)

  /** The slicing core over any (media_id, payload: binary) frame —
    * split out so byte-exactness is testable on raw non-UTF8 bytes. */
  def frameSampleOf(media: DataFrame, frameBytes: Int,
      everyK: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(1),
          greatest(length(col("payload")), lit(1)), lit(frameBytes)))
          .as(Seq("frame_no", "start")))
      .select(col("media_id"), col("frame_no"),
        col("payload").substr(col("start"), lit(frameBytes)).as("frame"))
      .filter(col("frame_no") % everyK === 0 && length(col("frame")) > 0)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames_kept"),
        sum(length(col("frame"))).as("bytes_kept"))
}
