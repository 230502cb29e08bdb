package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * The decode step is STUBBED (this environment ships no image/audio codecs):
  * `decodeImageStub` derives deterministic fake features from the bytes.
  * Everything around it — the schema, the per-partition batched processing
  * shape, the partitioning story — is real: swap the stub for a JNI/codec
  * call and nothing else changes.
  *
  * Scale: media blobs dominate row size, so feature extraction uses
  * `mapPartitions` (one decoder init per partition, the Scala analog of a
  * batched `mapInPandas`), and outputs drop the blob column immediately so
  * downstream stages shuffle features, not bytes.
  */
object Multimodal {

  /** Canonical media-table schema: opaque content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("source_uri", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_length", IntegerType, nullable = false),
    StructField("content_sha256", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature_vec", ArrayType(FloatType), nullable = true)))

  /** STUB decoder: a real implementation would parse the container format
    * (PNG/JPEG headers, WAV frames, ...). The stub derives deterministic
    * pseudo-features from SHA-256 of the bytes so the pipeline shape is
    * testable end-to-end.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    def u(i: Int): Int = digest(i) & 0xff
    val width = 64 + (u(0) << 4 | u(1) >> 4) // deterministic 64..4159
    val height = 64 + (u(2) << 4 | u(3) >> 4)
    val vec = (0 until 8).map(i => (u(i * 4) / 255.0f)).toArray
    (width, height, vec)
  }

  /** Batched feature extraction over a media DataFrame: one decoder "init"
    * per partition, blob column dropped at the source.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content")
      .rdd
      .mapPartitions { rows =>
        // decoder/codec initialization would happen once here
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          val id = r.getLong(0)
          val mtype = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val hex = sha.digest(bytes).map("%02x".format(_)).mkString
          val (w, h, vec) = decodeImageStub(bytes)
          Row(id, mtype, bytes.length, hex,
            if (mtype == "image") w else null,
            if (mtype == "image") h else null,
            vec)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** STUB resize: a real implementation would decode, scale, re-encode; the
    * stub emits sha256(bytes) ++ "WxH" so output bytes are deterministic and
    * dimension-dependent. The DataFrame shape is the real one: per-partition
    * codec init, blob in → blob out, metadata updated in place.
    */
  def resizeImageStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    digest ++ s"${w}x$h".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Resize every image row to `w`×`h` (non-image rows pass through
    * untouched). Same `mediaSchema` out as in — resize composes with any
    * other media stage.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content", "mime_type", "source_uri")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val mtype = r.getString(1)
          if (mtype != "image") Row(r.getLong(0), mtype, r.get(2), r.get(3), r.get(4))
          else {
            val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
            val uri = Option(r.getString(4)).map(_ + s"?resized=${w}x$h").orNull
            Row(r.getLong(0), mtype, resizeImageStub(bytes, w, h), r.get(3), uri)
          }
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_index", LongType, nullable = false),
    StructField("frame_sha256", StringType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = true)))

  /** Frame sampling for video rows: one input blob fans out to its sampled
    * frames (count = 1 + byte_length mod `maxFrames` in the stub; a real
    * decoder would step the container by timestamp). STUB frame bytes are
    * `content ++ ":index"` so every frame is deterministic and
    * oracle-replicable via sha256; the shape — flatMap fan-out inside
    * `mapPartitions`, blob dropped before any shuffle — is the real one.
    */
  def sampleFrames(media: DataFrame, maxFrames: Int): DataFrame = {
    require(maxFrames > 0, "maxFrames must be positive")
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "video")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val n = 1 + bytes.length % maxFrames
          (0 until n).map { i =>
            val frame = bytes ++ s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)
            Row(id, i.toLong, sha.digest(frame).map("%02x".format(_)).mkString, frame)
          }
        }
      }
    spark.createDataFrame(out, frameSchema)
  }

  /** Build a media table from the documents table (text bytes as stand-in
    * blobs) — gives the multimodal path a deterministic test fixture.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"),
      lit("application/octet-stream").as("mime_type"),
      concat(lit("synthetic://doc/"), col("doc_id")).as("source_uri"))
}
