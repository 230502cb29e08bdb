package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * IMAGE decode is REAL: [[decodePng]]/[[imagePixelStats]] run
  * `javax.imageio.ImageIO` (JDK-public, no external codec) over actual PNG
  * bytes — encode → decode roundtrips are certified against a closed-form
  * pixel oracle (q199). Audio/video decode remains STUBBED (this
  * environment ships no media codecs beyond the JDK): `decodeImageStub`
  * derives deterministic fake features from the bytes so those pipeline
  * shapes stay testable end-to-end; swap it for a JNI/codec call and
  * nothing else changes.
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

  /** REAL nearest-neighbor resize: decode with `javax.imageio`, resample
    * with the sampling arithmetic PINNED to integer division
    * (`srcX = x'·w div w'` — floor semantics, no float rounding mode to
    * disagree on), re-encode PNG. Pinning the formula is what makes the
    * whole decode → transform → encode → decode chain ORACLE-PREDICTABLE:
    * an arithmetic oracle can name every output pixel without running any
    * codec. None when the bytes are not a decodable image.
    */
  def resizeNearest(bytes: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      Some(encodePng(w2, h2, (x2, y2) => {
        val rgb = img.getRGB(x2 * w / w2, y2 * h / h2)
        ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      }))
    }
  }

  /** [[resizeImages]] with the REAL codec path ([[resizeNearest]]):
    * image rows are decoded, resampled, and re-encoded per partition (one
    * codec context per partition); undecodable image bytes yield a null
    * content AND a null mime_type instead of failing the partition.
    * Non-image rows pass through untouched. The re-encode always emits
    * PNG, so a successfully-resized row's `mime_type` becomes
    * `image/png` whatever the input codec was — carrying the original
    * mime over PNG bytes would be a metadata lie for any non-PNG input
    * (the round-13 advice finding).
    */
  def resizeImagesReal(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content", "mime_type", "source_uri")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val mtype = r.getString(1)
          if (mtype != "image") Row(r.getLong(0), mtype, r.get(2), r.get(3), r.get(4))
          else {
            val resized = Option(r.getAs[Array[Byte]](2))
              .flatMap(resizeNearest(_, w, h)).orNull
            val mime = if (resized == null) null else "image/png"
            val uri = Option(r.getString(4)).map(_ + s"?resized=${w}x$h").orNull
            Row(r.getLong(0), mtype, resized, mime, uri)
          }
        }
      }
    spark.createDataFrame(out, mediaSchema)
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

  /** Encode a width×height RGB image as real PNG bytes via
    * `javax.imageio` — the executor-side encoder for deterministic image
    * fixtures (and the re-encode half a real resize would use). Pure
    * function of `pixel`, so an encode → [[decodePng]] roundtrip is
    * oracle-predictable: PNG is lossless and TYPE_INT_RGB carries the
    * exact 8-bit channels through.
    */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeVia("png", width, height, pixel)

  /** One lossless-encoder body for every ImageIO container format
    * (PNG/BMP share the pixel fill verbatim — a packing fix must reach
    * both).
    */
  private def encodeVia(format: String, width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, (r & 0xff) << 16 | (g & 0xff) << 8 | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** REAL image decode: parse PNG/JPEG/GIF/BMP bytes with
    * `javax.imageio.ImageIO` and return (width, height, Σr, Σg, Σb) —
    * dimension metadata plus exact per-channel pixel sums (the integer
    * form of channel means: no float fold to pin). None when the bytes
    * are not a decodable image.
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
          x += 1
        }
        y += 1
      }
      Some((img.getWidth, img.getHeight, rs, gs, bs))
    }
  }

  val pixelStatSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("r_sum", LongType, nullable = true),
    StructField("g_sum", LongType, nullable = true),
    StructField("b_sum", LongType, nullable = true)))

  /** Batched REAL decode over a media frame: every image row's content is
    * parsed by `javax.imageio` (one decoder context per partition — the
    * same `mapPartitions` batching as [[extractFeatures]]); undecodable or
    * null blobs yield null stats instead of failing the partition. Blob
    * dropped at the source; only fixed-width stats flow downstream.
    */
  def imagePixelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "image")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(decodePng) match {
            case Some((w, h, rs, gs, bs)) => Row(id, w, h, rs, gs, bs)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, pixelStatSchema)
  }

  /** The shared closed-form test pattern: for image id `d`, dimensions
    * `w = 8 + d mod 9`, `h = 8 + d mod 7` and channel values
    * `(d + x + y)`, `(2d + 3x + 5y)`, `(7d + 11x + 13y)` mod 256 — every
    * pixel of every fixture image is predictable from the id alone, so a
    * SQL oracle can name decoded statistics without running any codec.
    */
  def patternDims(d: Long): (Int, Int) = ((8 + d % 9).toInt, (8 + d % 7).toInt)
  def patternPixel(d: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((d + x + y) % 256).toInt,
    ((2 * d + 3 * x + 5 * y) % 256).toInt,
    ((7 * d + 11 * x + 13 * y) % 256).toInt)

  /** The LOSSY-codec test pattern: one solid color per image, channels
    * distinct functions of the id. JPEG's spatial transform makes the
    * wrapping [[patternPixel]] gradient unpredictable after quantization
    * (probed max deviation 176/255 at quality 0.95 — sharp mod-256 wraps
    * shred under the DCT + chroma subsampling), while a constant block is
    * DC-only and round-trips within a few counts; distinct per-channel
    * values keep a channel swap or colorspace bug loudly detectable.
    */
  def patternSolid(d: Long)(x: Int, y: Int): (Int, Int, Int) = (
    (d % 256).toInt, ((3 * d + 50) % 256).toInt, ((7 * d + 100) % 256).toInt)

  /** Deterministic REAL-PNG media fixture from the documents table: every
    * `doc_id % 3 = 0` document becomes a [[patternPixel]] image — PNG is
    * lossless, so the oracle predicts every decoded statistic EXACTLY.
    * Encoding runs in the executors ([[encodePng]]), one codec context
    * per partition.
    */
  def pngMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 3 === 0)
      .select("doc_id")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val (w, h) = patternDims(d)
          val png = encodePng(w, h, patternPixel(d))
          Row(d, "image", png, "image/png", s"synthetic://png/$d")
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Encode a pattern as JPEG via the JDK writer at an explicit quality:
    * the lossy sibling of [[encodePng]]. One writer per call — callers
    * batch per partition exactly like the PNG path.
    */
  def encodeJpeg(
      width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int),
      quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, (r & 0xff) << 16 | (g & 0xff) << 8 | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** Deterministic REAL-JPEG media fixture: every `doc_id % 3 = 1`
    * document becomes a [[patternSolid]] image at the shared
    * [[patternDims]], JPEG-encoded (quality 0.95) — lossy, so decoded
    * pixels are NOT exactly the pattern; certification happens through
    * [[decodePatternDeviation]]'s bounded-error verdicts instead.
    */
  def jpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 3 === 1)
      .select("doc_id")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val (w, h) = patternDims(d)
          val jpg = encodeJpeg(w, h, patternSolid(d), quality = 0.95f)
          Row(d, "image", jpg, "image/jpeg", s"synthetic://jpg/$d")
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val deviationSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("exact_pixels", BooleanType, nullable = true),
    StructField("err_within_bound", BooleanType, nullable = true)))

  /** Decode every media row with `javax.imageio` (format auto-detected
    * from the bytes — PNG and JPEG through ONE code path) and compare the
    * decoded pixels against the `pattern` ground truth for its id:
    * emits the decoded dimensions, whether the round-trip is bit-exact
    * (PNG must be; JPEG almost never is), and whether the max per-channel
    * absolute deviation stays within `maxAbsErr` (the lossy-codec
    * certification: a wrong colorspace, a channel swap, or a subsampling
    * bug blows any reasonable bound, while healthy JPEG quantization
    * noise at quality 0.95 stays small). Dimension mismatch → deviation
    * verdicts null, decode failure → everything null but decode_ok=false.
    */
  def decodePatternDeviation(
      media: DataFrame,
      maxAbsErr: Int,
      pattern: Long => (Int, Int) => (Int, Int, Int) = patternPixel): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "image")
      .select("media_id", "mime_type", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val mime = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2))
          val img = bytes.flatMap(b =>
            Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))))
          img match {
            case None => Row(d, mime, null, null, false, null, null)
            case Some(im) =>
              val (w, h) = patternDims(d)
              if (im.getWidth != w || im.getHeight != h)
                Row(d, mime, im.getWidth, im.getHeight, true, null, null)
              else {
                val pat = pattern(d) // hoisted: one closure per image, not per pixel
                var maxErr = 0
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = im.getRGB(x, y)
                    val (er, eg, eb) = pat(x, y)
                    val e = math.max(
                      math.abs(((rgb >> 16) & 0xff) - er),
                      math.max(
                        math.abs(((rgb >> 8) & 0xff) - eg),
                        math.abs((rgb & 0xff) - eb)))
                    if (e > maxErr) maxErr = e
                    x += 1
                  }
                  y += 1
                }
                Row(d, mime, w, h, true, maxErr == 0, maxErr <= maxAbsErr)
              }
          }
        }
      }
    spark.createDataFrame(out, deviationSchema)
  }

  // ---- Perceptual image hashing (dHash): content-level near-duplicate
  // detection for image columns — re-encoded (PNG→BMP) and resized copies
  // of one image hash identically; the Hamming-banded pair join is the
  // SimHash quarter-block probe on the pixel tier. ----

  /** Closed-form 8-level cell pattern for the dHash fixture: image id `d`,
    * cell `k` (row-major on the 9×8 pooling grid) gets gray level
    * `20 + 30·mix(d,k)` where `mix` is an integer xor-multiply mix —
    * xor steps break the arithmetic structure that made polynomial mixes
    * collide (a quadratic's cross-id difference is LINEAR in k, so 1% of
    * id pairs shared near-identical patterns; probed before this form was
    * chosen). Every step stays far inside Long range, and the same five
    * operations are SQL-expressible, so the DuckDB oracle replays the
    * pixel→hash pipeline from the id alone.
    */
  def dhashLevel(d: Long, k: Int): Int = {
    val x1 = (d * 2654435761L + k * 40503L) % 2147483647L
    val x2 = x1 ^ (x1 / 65536L)
    val x3 = (x2 * 2246822519L) % 2147483629L
    ((x3 ^ (x3 / 8192L)) % 8L).toInt
  }

  /** Near-copy perturbation: cells 29 and 59 get their lowest level bit
    * flipped (±1 level) — at most 2 dHash bits per cell, all inside bit
    * bands 1 and 3, so a perturbed copy ALWAYS shares bands 0 and 2 with
    * its original (guaranteed candidate recall for the planted family).
    */
  def dhashPerturbedLevel(d: Long, k: Int): Int =
    if (k == 29 || k == 59) dhashLevel(d, k) ^ 1 else dhashLevel(d, k)

  /** Far-copy ("cousin") perturbation: odd columns of grid rows 2/3/6/7
    * shifted by 4 levels — many bit flips, but again ONLY in bands 1 and
    * 3, so the cousin is always a CANDIDATE pair. Cousin distances
    * CONCENTRATE well past the q259 threshold (probed 7–25 over the full
    * sf1 id range), which keeps the candidate-rejected branch live at
    * every scale — but the guarantee is candidacy, not rejection: a tail
    * of families (17 of 2,499 even ids at sf1) lands at Hamming ≤ 8 and
    * is reported as a pair, identically by both engines (the oracle
    * replays the same closed form, so the threshold verdict can never
    * diverge).
    */
  def dhashCousinLevel(d: Long, k: Int): Int = {
    val lv = dhashLevel(d, k)
    if ((k / 9 == 2 || k / 9 == 3 || k / 9 == 6 || k / 9 == 7) && (k % 9) % 2 == 1)
      (lv + 4) % 8
    else lv
  }

  /** Fixture dims: multiples of the 9×8 pooling grid, so cell pooling is
    * exact at 1× and 2× (a 2× nearest-neighbor upscale preserves every
    * pooled mean EXACTLY — the resized copy's dHash equals the original's
    * bit for bit).
    */
  def dhashDims(d: Long): (Int, Int) =
    (9 * (1 + (d % 2)).toInt, 8 * (1 + ((d / 2) % 2)).toInt)

  /** Encode pattern pixels as BMP via the JDK writer — the lossless
    * re-encode sibling of [[encodePng]] (different container, identical
    * pixels), used to plant re-encoded duplicates.
    */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeVia("bmp", width, height, pixel)

  /** Deterministic perceptual-dedup media fixture: every `doc_id % 101 = 0`
    * document becomes a dHash-pattern family —
    *   - `d`: the original PNG ([[dhashLevel]] cells at [[dhashDims]]);
    *   - `-(4d+1)`: BMP re-encode (same pixels, different container);
    *   - `-(4d+2)`: 2× nearest-neighbor resized PNG ([[resizeNearest]]);
    *   - `-(4d+3)`: perturbed near-copy ([[dhashPerturbedLevel]]);
    *   - `-4d` (even `d`): the far "cousin" ([[dhashCousinLevel]]) —
    *     candidate by construction, rejected by the Hamming threshold;
    *   - `-4d` (odd `d`): the document's text bytes — NOT an image; the
    *     null-hash row the dedup must silently exclude.
    */
  def dhashMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      // doc 0 exists in the fixture corpus and -(4·0) would collide with
      // the original's media id — the family id scheme needs d > 0
      .where(col("doc_id") % 101 === 0 && col("doc_id") > 0)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val (w, h) = dhashDims(d)
          def px(levf: Int => Int)(x: Int, y: Int): (Int, Int, Int) = {
            val g = 20 + 30 * levf((y / (h / 8)) * 9 + x / (w / 9))
            (g, g, g)
          }
          val orig = encodePng(w, h, px(dhashLevel(d, _)))
          val last =
            if (d % 2 == 1) {
              val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
              Row(-(4 * d), "image", garbage, "application/octet-stream",
                s"synthetic://raw/$d")
            } else
              Row(-(4 * d), "image", encodePng(w, h, px(dhashCousinLevel(d, _))),
                "image/png", s"synthetic://dhash/$d?cousin")
          Seq(
            Row(d, "image", orig, "image/png", s"synthetic://dhash/$d"),
            Row(-(4 * d + 1), "image", encodeBmp(w, h, px(dhashLevel(d, _))),
              "image/bmp", s"synthetic://dhash/$d?bmp"),
            Row(-(4 * d + 2), "image", resizeNearest(orig, 2 * w, 2 * h).get,
              "image/png", s"synthetic://dhash/$d?x2"),
            Row(-(4 * d + 3), "image", encodePng(w, h, px(dhashPerturbedLevel(d, _))),
              "image/png", s"synthetic://dhash/$d?pert"),
            last)
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  /** 64-bit difference hash of REAL decoded pixels: pool intensities
    * (r+g+b) onto the 9×8 grid (cell of pixel x is `9x div w` — exact
    * block pooling when dims are grid multiples, floor pooling
    * otherwise), then bit `m = 8j + i` is set iff cell (i+1, j)'s mean
    * intensity strictly exceeds cell (i, j)'s — compared by integer
    * cross-multiplication (`sumₐ·areaᵦ > sumᵦ·areaₐ`), so no float
    * division ever runs. A 2× nearest-neighbor upscale quadruples every
    * cell's sum AND area, leaving every comparison — hence the hash —
    * bit-identical. None for undecodable bytes or images smaller than
    * the grid (or past 2^14 per side: keeps the cross-multiply far from
    * Long overflow — 765·(cell area)² at 16384² is ~1e16).
    */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    imageDecodeAttempts.incrementAndGet()
    // ImageIO.read THROWS (not null) on recognized-but-corrupt streams —
    // a truncated PNG must yield the documented null hash, not kill the
    // partition
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w < 9 || h < 8 || w > 16384 || h > 16384) return None
    val sums = Array.ofDim[Long](8, 9)
    val areas = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val j = y * 8 / h
      var x = 0
      while (x < w) {
        val i = x * 9 / w
        val rgb = img.getRGB(x, y)
        sums(j)(i) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        areas(j)(i) += 1L
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (sums(j)(i + 1) * areas(j)(i) > sums(j)(i) * areas(j)(i + 1))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    Some(hash)
  }

  /** Local-mode test instrumentation: total [[imageDHash]] invocations in
    * this JVM (executor threads share it under `local[*]`), letting a spec
    * assert a plan decodes each blob exactly once — decode is the dominant
    * per-blob cost, so an accidental second scan of an uncached hash frame
    * doubles real work. One uncontended atomic increment next to a full
    * image decode is noise; not part of the operator contract.
    */
  val imageDecodeAttempts = new java.util.concurrent.atomic.AtomicLong

  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = true)))

  /** Batched [[imageDHash]] over a media frame: per-partition decode (the
    * [[imagePixelStats]] batching), undecodable blobs keep their row with
    * a null hash, blobs never leave the scan — only the 8-byte
    * fingerprint flows into the dedup join.
    */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "image")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(imageDHash) match {
            case Some(hv) => Row(id, hv)
            case None     => Row(id, null)
          }
        }
      }
    spark.createDataFrame(out, dhashSchema)
  }

  // ---- 128-bit image dHash (the band-saturation mitigation's image-tier
  // producer): the 9×8 pooling doubled vertically to 9×16 — 16 rows × 8
  // difference bits = 128 bits in two longs, banded 4×32 by
  // [[graft.operators.Dedup.fingerprint128NearDuplicates]]. At billions
  // of images the 64-bit path's 16-bit band values saturate every bucket
  // past any workable cap (q263's diagnosed failure); the 32-bit band
  // values here hold ~N/2^32 rows — the image-dedup shape for corpora
  // where that collapse is real. ----

  /** 128-bit difference hash of REAL decoded pixels: intensities pooled
    * onto a 9×16 grid (same floor pooling and integer cross-multiplied
    * strict comparisons as [[imageDHash]]); bit `m = 8j + i` of the
    * (hi, lo) pair — rows 0–7 fill `lo`, rows 8–15 fill `hi`. The same
    * invariances hold by the same argument: lossless re-encodes and 2×
    * nearest-neighbor upscales (dims grid-multiples) hash bit-identically.
    * None for undecodable bytes or images smaller than the 9×16 grid
    * (or past 2^14 per side).
    */
  def imageDHash128(bytes: Array[Byte]): Option[(Long, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w < 9 || h < 16 || w > 16384 || h > 16384) return None
    val sums = Array.ofDim[Long](16, 9)
    val areas = Array.ofDim[Long](16, 9)
    var y = 0
    while (y < h) {
      val j = y * 16 / h
      var x = 0
      while (x < w) {
        val i = x * 9 / w
        val rgb = img.getRGB(x, y)
        sums(j)(i) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        areas(j)(i) += 1L
        x += 1
      }
      y += 1
    }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 16) {
      var i = 0
      while (i < 8) {
        if (sums(j)(i + 1) * areas(j)(i) > sums(j)(i) * areas(j)(i + 1)) {
          val m = j * 8 + i
          if (m < 64) lo |= 1L << m else hi |= 1L << (m - 64)
        }
        i += 1
      }
      j += 1
    }
    Some((hi, lo))
  }

  val dhash128Schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash_hi", LongType, nullable = true),
    StructField("dhash_lo", LongType, nullable = true)))

  /** Batched [[imageDHash128]] over a media frame: per-partition decode,
    * undecodable blobs keep their row with null halves, blobs never
    * leave the scan — only 16 bytes of fingerprint enter the join.
    */
  def imageDHashes128(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "image")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(imageDHash128) match {
            case Some((hv, lv)) => Row(id, hv, lv)
            case None           => Row(id, null, null)
          }
        }
      }
    spark.createDataFrame(out, dhash128Schema)
  }

  /** Fixture dims for the 128-bit grid: multiples of 9×16 so pooling is
    * exact at 1× and 2×.
    */
  def dhash128Dims(d: Long): (Int, Int) =
    (9 * (1 + (d % 2)).toInt, 16 * (1 + ((d / 2) % 2)).toInt)

  /** Near-copy: cells 47 (row 5) and 122 (row 13) get the lowest level
    * bit flipped — ≤ 2 bits per cell, all inside 32-bit bands 1 (rows
    * 4–7) and 3 (rows 12–15), so the copy always shares bands 0 and 2
    * with its original.
    */
  def dhash128PerturbedLevel(d: Long, k: Int): Int =
    if (k == 47 || k == 122) dhashLevel(d, k) ^ 1 else dhashLevel(d, k)

  /** Far cousin: odd columns of grid rows 5/6/13/14 shifted 4 levels —
    * many flips, all inside bands 1 and 3 (guaranteed candidate), with
    * the alternating-interior shape the fixture memory prescribes.
    */
  def dhash128CousinLevel(d: Long, k: Int): Int = {
    val lv = dhashLevel(d, k)
    if ((k / 9 == 5 || k / 9 == 6 || k / 9 == 13 || k / 9 == 14) && (k % 9) % 2 == 1)
      (lv + 4) % 8
    else lv
  }

  /** The [[dhashMediaFromDocuments]] construction on the 9×16 grid:
    * every `doc_id % 113 = 0` (> 0) document becomes a 128-bit family —
    * original PNG, BMP re-encode, 2× resize, perturbed near-copy,
    * and (even d) the far cousin / (odd d) non-image text bytes.
    */
  def dhash128MediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 113 === 0 && col("doc_id") > 0)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val (w, h) = dhash128Dims(d)
          def px(levf: Int => Int)(x: Int, y: Int): (Int, Int, Int) = {
            val g = 20 + 30 * levf((y / (h / 16)) * 9 + x / (w / 9))
            (g, g, g)
          }
          val orig = encodePng(w, h, px(dhashLevel(d, _)))
          val last =
            if (d % 2 == 1) {
              val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
              Row(-(4 * d), "image", garbage, "application/octet-stream",
                s"synthetic://raw/$d")
            } else
              Row(-(4 * d), "image", encodePng(w, h, px(dhash128CousinLevel(d, _))),
                "image/png", s"synthetic://dhash128/$d?cousin")
          Seq(
            Row(d, "image", orig, "image/png", s"synthetic://dhash128/$d"),
            Row(-(4 * d + 1), "image", encodeBmp(w, h, px(dhashLevel(d, _))),
              "image/bmp", s"synthetic://dhash128/$d?bmp"),
            Row(-(4 * d + 2), "image", resizeNearest(orig, 2 * w, 2 * h).get,
              "image/png", s"synthetic://dhash128/$d?x2"),
            Row(-(4 * d + 3), "image", encodePng(w, h, px(dhash128PerturbedLevel(d, _))),
              "image/png", s"synthetic://dhash128/$d?pert"),
            last)
        }
      }
    spark.createDataFrame(out, mediaSchema)
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

  // ---- REAL audio tier: WAV PCM through javax.sound.sampled (pure-JVM,
  // headless-safe — the audio sibling of the javax.imageio image tier) ----

  /** The closed-form audio test pattern: audio id `d` has
    * `800 + d mod 401` samples, sample `i` is the integer sawtooth
    * `((31d + 17i) mod 4096) − 2048` — every 16-bit PCM sample of every
    * fixture clip is predictable from the id alone, so a SQL oracle can
    * name decoded statistics without parsing any container.
    */
  def audioSamples(d: Long): Int = (800 + d % 401).toInt
  def patternSample(d: Long)(i: Int): Short =
    (((31 * d + 17 * i) % 4096) - 2048).toShort
  val AudioRate = 16000

  /** Encode 16-bit little-endian mono PCM as a REAL RIFF/WAVE container
    * via `javax.sound.sampled.AudioSystem` — the decode side must parse
    * the same container back, so a header/codec bug cannot cancel out.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL WAV decode: parse the RIFF container with `AudioSystem`, read
    * the PCM frames, and return
    * (sample_rate, n_samples, Σs, Σ|s|, Σs², min, max) — exact integer
    * waveform statistics (sums fit a long comfortably: |s| ≤ 2048,
    * s² ≤ 2²², per-clip counts bounded). None for undecodable bytes or
    * formats other than 16-bit little-endian mono.
    */
  def decodeWav(bytes: Array[Byte])
      : Option[(Int, Long, Long, Long, Long, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        var sum = 0L; var sumAbs = 0L; var sumSq = 0L
        var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < n) {
          val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
          sum += s; sumAbs += math.abs(s); sumSq += s * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        if (n == 0) None
        else Some((fmt.getSampleRate.toInt, n.toLong, sum, sumAbs, sumSq, mn, mx))
      }
    } catch { case _: Exception => None }

  /** Deterministic REAL-WAV media fixture from the documents table: every
    * `doc_id % 3 = 1` document becomes a [[patternSample]] clip (the
    * audio third of the media-type convention; images take % 3 = 0).
    * Encoding runs in the executors, one encoder per row batch.
    */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 3 === 1)
      .select("doc_id")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val n = audioSamples(d)
          val wav = encodeWav(AudioRate, Array.tabulate(n)(patternSample(d)))
          Row(d, "audio", wav, "audio/wav", s"synthetic://wav/$d")
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val audioStatSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("sum_samples", LongType, nullable = true),
    StructField("sum_abs", LongType, nullable = true),
    StructField("sum_sq", LongType, nullable = true),
    StructField("min_sample", LongType, nullable = true),
    StructField("max_sample", LongType, nullable = true)))

  /** Batched REAL decode over an audio media frame — the
    * [[imagePixelStats]] shape for WAV blobs: per-partition decoder
    * batches, undecodable/null blobs keep their row with null stats,
    * blobs never leave the scan (only fixed-width stats flow on).
    */
  def audioWaveformStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "audio")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(decodeWav) match {
            case Some((sr, n, s, sa, sq, mn, mx)) =>
              Row(id, sr.toLong, n, s, sa, sq, mn, mx)
            case None => Row(id, null, null, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, audioStatSchema)
  }

  // ---- Perceptual AUDIO fingerprinting: the dHash idea on waveforms —
  // gain-scaled re-encodes of one clip fingerprint identically (uniform
  // scaling cancels in the cross-multiplied window-mean comparisons), so
  // volume-normalized duplicates cluster. Shares the quarter-block
  // Hamming join with the text/image tiers
  // ([[graft.operators.Dedup.fingerprintNearDuplicates]]). ----

  /** Closed-form fingerprint-fixture waveform: a |sawtooth| whose SLOPE is
    * keyed by the id (`17 + 2(d mod 23)` — slope-keying is what
    * decorrelates window profiles across ids; with a fixed slope, phase
    * pairs collide: probed 3.4% of id pairs within Hamming 8 before the
    * keyed slope, 0.37% after, all consistent with the oracle either
    * way). Values stay within ±2048 so a ×3 perturbation is far from
    * Short clipping.
    */
  def audioFpSample(d: Long)(i: Int): Short =
    ((31 * d + (17 + 2 * (d % 23)) * i) % 4096 - 2048).toShort

  /** 64-bit perceptual audio fingerprint over REAL decoded 16-bit mono
    * PCM: mean |amplitude| pooled into 65 windows (`w = 65i div n` floor
    * pooling), bit `m` set iff window m+1's mean strictly exceeds window
    * m's — integer cross-multiplication, no division. Uniform gain
    * scales every window sum equally, so the fingerprint is EXACTLY
    * gain-invariant. None for undecodable bytes, clips shorter than the
    * window grid, or past 2^22 samples (keeps the cross-multiply far
    * from Long overflow).
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n < 65 || n > (1 << 22)) None
        else {
          val sums = new Array[Long](65)
          val cnts = new Array[Long](65)
          var i = 0
          while (i < n) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
            val w = (i * 65L / n).toInt
            sums(w) += math.abs(s); cnts(w) += 1L
            i += 1
          }
          var hash = 0L
          var m = 0
          while (m < 64) {
            if (sums(m + 1) * cnts(m) > sums(m) * cnts(m + 1))
              hash |= 1L << m
            m += 1
          }
          Some(hash)
        }
      }
    } catch { case _: Exception => None }

  /** The audio-fingerprint perturbation factor for fixture window `w`:
    * near-copy (`pert = 1`) triples windows 29 and 59 — at most two bits
    * per window, inside bit bands 1 and 3; far "cousin" (`pert = 2`)
    * triples the ODD INTERIOR windows of those bands (17–31, 49–63 odd —
    * interior, because bit 15 compares windows 15 and 16 ACROSS the
    * band-0/1 boundary, and alternating, because uniformly scaling a
    * contiguous block cancels in every within-block comparison: probed
    * cousin distance 0–4 with the uniform block vs 2–16 alternating).
    * Both variants share bands 0 and 2 with the original — guaranteed
    * candidates, the q259 construction.
    */
  def audioFpPerturb(pert: Int, w: Int): Int = pert match {
    case 1 if w == 29 || w == 59 => 3
    case 2 if w % 2 == 1 && ((w >= 17 && w <= 31) || (w >= 49 && w <= 63)) => 3
    case _ => 1
  }

  /** Deterministic audio-fingerprint media fixture: every
    * `doc_id % 103 = 0` (> 0) document becomes a clip family — the
    * original, ×2 and ×3 gain re-encodes (fingerprint-identical), the
    * near-copy, and for even ids the far cousin / for odd ids the
    * document's text bytes (not a WAV: the null-fingerprint row).
    */
  def audioFpMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 103 === 0 && col("doc_id") > 0)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val n = audioSamples(d)
          def clip(gain: Int, pert: Int): Array[Byte] = {
            val arr = new Array[Short](n)
            var i = 0
            while (i < n) {
              val w = (i * 65L / n).toInt
              arr(i) = (audioFpSample(d)(i) * gain * audioFpPerturb(pert, w)).toShort
              i += 1
            }
            encodeWav(16000, arr)
          }
          val last =
            if (d % 2 == 1) {
              val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
              Row(-(4 * d), "audio", garbage, "application/octet-stream",
                s"synthetic://raw/$d")
            } else
              Row(-(4 * d), "audio", clip(1, 2), "audio/wav",
                s"synthetic://afp/$d?cousin")
          Seq(
            Row(d, "audio", clip(1, 0), "audio/wav", s"synthetic://afp/$d"),
            Row(-(4 * d + 1), "audio", clip(2, 0), "audio/wav", s"synthetic://afp/$d?x2"),
            Row(-(4 * d + 2), "audio", clip(3, 0), "audio/wav", s"synthetic://afp/$d?x3"),
            Row(-(4 * d + 3), "audio", clip(1, 1), "audio/wav", s"synthetic://afp/$d?pert"),
            last)
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("afp", LongType, nullable = true)))

  /** Batched [[audioFingerprint]] over a media frame: per-partition
    * decode, undecodable blobs keep their row with a null fingerprint,
    * blobs never leave the scan.
    */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "audio")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(audioFingerprint) match {
            case Some(hv) => Row(id, hv)
            case None     => Row(id, null)
          }
        }
      }
    spark.createDataFrame(out, audioFpSchema)
  }

  // ---- REAL video tier: uncompressed AVI (RIFF 'AVI ' + BI_RGB DIB
  // frames) parsed pure-JVM — the video sibling of the WAV tier above.
  // javax has no AVI reader, so both sides are hand-written to the RIFF
  // spec; the decoder walks the CHUNK STRUCTURE (sizes from headers, tags
  // checked, strf geometry trusted over assumptions), so an encoder layout
  // bug cannot cancel out against a decoder that assumed the same layout.

  /** Closed-form video test pattern: video `d` has `3 + d mod 5` frames of
    * `videoWidth(d) x videoHeight(d)` BGR24 pixels; frame `f`, pixel
    * (x, y) has channels B/G/R below — every byte of every fixture frame
    * is predictable from (d, f, x, y) alone, so a SQL oracle can name the
    * decoded statistics without parsing any container.
    */
  def videoFrames(d: Long): Int = (3 + d % 5).toInt
  // width varies over d % 9 / 3 because every video id is ≡ 2 (mod 3) —
  // a plain d % 3 would freeze the width; 8|12|16 keep 3w % 4 == 0, and
  // the encoder still pads generically (spec-exercised at odd widths)
  def videoWidth(d: Long): Int = (8 + (d % 9) / 3 * 4).toInt
  def videoHeight(d: Long): Int = (6 + (d % 2) * 2).toInt // 6|8
  def patternB(d: Long)(f: Int, x: Int, y: Int): Int =
    ((d * 3 + f * 7 + x * 5 + y * 11) % 256).toInt
  def patternG(d: Long)(f: Int, x: Int, y: Int): Int =
    ((d * 5 + f * 11 + x * 7 + y * 3) % 256).toInt
  def patternR(d: Long)(f: Int, x: Int, y: Int): Int =
    ((d * 7 + f * 3 + x * 11 + y * 5) % 256).toInt
  /** Fixture frame rate: strh dwRate/dwScale = 10/1. */
  val VideoFps = 10

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def tag(b: java.io.ByteArrayOutputStream, t: String): Unit =
    b.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Encode bottom-up BGR24 frames as a REAL uncompressed AVI container:
    * RIFF('AVI ') with LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' +
    * strf BITMAPINFOHEADER)), LIST movi of '00db' DIB chunks, and an idx1
    * index — the standard layout any AVI reader accepts. Rows are padded
    * to 4 bytes per the DIB spec.
    */
  def encodeAvi(width: Int, height: Int, fps: Int,
      frames: Seq[(Int, Int) => (Int, Int, Int)]): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val frameBytes = rowBytes * height
    val frameData = frames.map { px =>
      val a = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        // bottom-up: DIB row 0 is the BOTTOM image row
        val imgY = height - 1 - y
        var x = 0
        while (x < width) {
          val (b, g, r) = px(x, imgY)
          val o = y * rowBytes + x * 3
          a(o) = b.toByte; a(o + 1) = g.toByte; a(o + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      a
    }
    buildAviContainer(width, height, fps, handler = "DIB ", compression = 0,
      chunkTag = "00db", bufBytes = frameBytes, frameData = frameData)
  }

  /** ONE RIFF/AVI container writer for both encoders — BI_RGB DIB
    * ([[encodeAvi]]) and MJPEG ([[encodeAviMjpeg]]) differ only in the
    * stream handler fourcc, strf biCompression, movi chunk tag, the
    * suggested buffer size, and the frame payloads; a header-layout fix
    * here reaches both fixtures (the offsets [[parseAvi]] depends on live
    * in exactly one place).
    */
  private def buildAviContainer(width: Int, height: Int, fps: Int,
      handler: String, compression: Int, chunkTag: String, bufBytes: Int,
      frameData: Seq[Array[Byte]]): Array[Byte] = {
    val n = frameData.size
    val out = new java.io.ByteArrayOutputStream()
    // strf: BITMAPINFOHEADER (40 bytes)
    val strf = new java.io.ByteArrayOutputStream()
    le32(strf, 40); le32(strf, width); le32(strf, height)
    le16(strf, 1); le16(strf, 24); le32(strf, compression) // planes, bpp
    le32(strf, bufBytes); le32(strf, 0); le32(strf, 0)
    le32(strf, 0); le32(strf, 0)
    // strh: AVISTREAMHEADER (56 bytes)
    val strh = new java.io.ByteArrayOutputStream()
    tag(strh, "vids"); tag(strh, handler)
    le32(strh, 0); le16(strh, 0); le16(strh, 0) // flags, priority, language
    le32(strh, 0) // initial frames
    le32(strh, 1); le32(strh, fps) // dwScale, dwRate -> fps
    le32(strh, 0); le32(strh, n) // start, length (frames)
    le32(strh, bufBytes); le32(strh, -1); le32(strh, 0) // bufsize, quality, samplesize
    le16(strh, 0); le16(strh, 0); le16(strh, width); le16(strh, height) // rcFrame
    // avih: MainAVIHeader (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    le32(avih, 1000000 / fps) // microseconds per frame
    le32(avih, bufBytes * fps); le32(avih, 0)
    le32(avih, 0x10) // AVIF_HASINDEX
    le32(avih, n); le32(avih, 0); le32(avih, 1) // totalframes, initial, streams
    le32(avih, bufBytes); le32(avih, width); le32(avih, height)
    le32(avih, 0); le32(avih, 0); le32(avih, 0); le32(avih, 0)
    def chunk(t: String, body: Array[Byte]): Array[Byte] = {
      val c = new java.io.ByteArrayOutputStream()
      tag(c, t); le32(c, body.length); c.write(body, 0, body.length)
      if (body.length % 2 == 1) c.write(0) // RIFF word alignment
      c.toByteArray
    }
    def list(t: String, body: Array[Byte]): Array[Byte] = {
      val c = new java.io.ByteArrayOutputStream()
      tag(c, "LIST"); le32(c, body.length + 4); tag(c, t)
      c.write(body, 0, body.length)
      c.toByteArray
    }
    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
    val moviBody = frameData.flatMap(f => chunk(chunkTag, f)).toArray
    val movi = list("movi", moviBody)
    // idx1: offsets are relative to the movi LIST's data start (the
    // 'movi' tag position), per the spec's common interpretation
    val idx = new java.io.ByteArrayOutputStream()
    var off = 4
    frameData.foreach { f =>
      tag(idx, chunkTag); le32(idx, 0x10) // AVIIF_KEYFRAME
      le32(idx, off); le32(idx, f.length)
      off += 8 + f.length + (f.length % 2)
    }
    val body = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
    tag(out, "RIFF"); le32(out, body.length + 4); tag(out, "AVI ")
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private def rdLe32(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
      ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
  private def rdLe16(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
  private def rdTag(a: Array[Byte], o: Int): String =
    new String(a, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** The MJPG fourcc as the little-endian BITMAPINFOHEADER
    * biCompression value ('M','J','P','G').
    */
  private val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Parsed AVI container: geometry, frame rate, the stream's
    * biCompression (0 = BI_RGB DIB, [[MjpgFourcc]] = MJPEG), and the
    * (offset, length) of every movi frame chunk — the shared walk behind
    * [[decodeAvi]] / [[decodeAviFrames]] (BI_RGB) and
    * [[mjpegPatternDeviation]] (MJPEG). None for undecodable bytes, any
    * compression but those two, or any bpp but 24.
    */
  private def parseAvi(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Seq[(Int, Int)])] =
    try {
      if (bytes.length < 12 || rdTag(bytes, 0) != "RIFF" ||
        rdTag(bytes, 8) != "AVI ") return None
      var width = -1; var height = -1; var bpp = -1; var compression = -1
      var rate = -1; var scale = -1
      var isVids = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // one chunk walker for every nesting level; LIST bodies recurse
      def walk(off: Int, end: Int): Unit = {
        var o = off
        while (o + 8 <= end) {
          val t = rdTag(bytes, o)
          val sz = rdLe32(bytes, o + 4)
          if (sz < 0 || o + 8 + sz > end) throw new IllegalStateException("bad chunk size")
          if (t == "LIST") {
            walk(o + 12, o + 8 + sz) // skip the 4-byte list type
          } else if (t == "strh" && !isVids) {
            // latch the FIRST video stream only: a multi-stream AVI's
            // audio strh ('auds') must not clobber the video scale/rate
            // or flip isVids off
            if (rdTag(bytes, o + 8) == "vids" &&
              (rdTag(bytes, o + 12) == "DIB " || rdLe32(bytes, o + 12) == 0 ||
                rdTag(bytes, o + 12) == "MJPG")) {
              isVids = true
              scale = rdLe32(bytes, o + 28)
              rate = rdLe32(bytes, o + 32)
            }
          } else if (t == "strf" && isVids && width < 0) {
            // geometry comes from the VIDEO stream's strf (strh precedes
            // strf within a strl per the spec; an audio strl's strf is
            // skipped because isVids is still false when it appears first
            // and width is already latched when it appears after)
            width = rdLe32(bytes, o + 12)
            height = rdLe32(bytes, o + 16)
            bpp = rdLe16(bytes, o + 22)
            compression = rdLe32(bytes, o + 24)
          } else if (t == "00db" || t == "00dc") {
            // dims bounded FIRST (2^20 px per side is far past any real
            // DIB), so the Long product below cannot itself overflow —
            // a crafted strf must fail closed here, never reach the
            // unguarded frameSums outside this try
            if (!isVids || bpp != 24 ||
              (compression != 0 && compression != MjpgFourcc) ||
              width <= 0 || height <= 0 ||
              width > (1 << 20) || height > (1 << 20))
              throw new IllegalStateException("unsupported stream")
            if (compression == 0) {
              val rowBytesL = (width.toLong * 3 + 3) / 4 * 4
              if (sz.toLong < rowBytesL * height)
                throw new IllegalStateException("short frame")
            }
            // MJPEG chunk sizes vary per frame (entropy-coded); the JPEG
            // decoder validates each blob itself
            frames += ((o + 8, sz))
          }
          o += 8 + sz + (sz % 2) // chunks are word-aligned
        }
      }
      walk(12, math.min(bytes.length, 8 + rdLe32(bytes, 4)))
      if (frames.isEmpty || scale <= 0 || rate <= 0) None
      else Some((width, height, rate / scale, compression, frames.toSeq))
    } catch { case _: Exception => None }

  /** Exact per-frame channel sums of one DIB frame (order-invariant, so
    * bottom-up row order never matters).
    */
  private def frameSums(bytes: Array[Byte], off: Int, width: Int,
      height: Int): (Long, Long, Long, Long, Long) = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var mn = 256L; var mx = -1L
    var y = 0
    while (y < height) {
      var x = 0
      val base = off + y * rowBytes
      while (x < width) {
        val b = (bytes(base + x * 3) & 0xff).toLong
        val g = (bytes(base + x * 3 + 1) & 0xff).toLong
        val r = (bytes(base + x * 3 + 2) & 0xff).toLong
        sumB += b; sumG += g; sumR += r
        val lo = math.min(b, math.min(g, r))
        val hi = math.max(b, math.max(g, r))
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
        x += 1
      }
      y += 1
    }
    (sumR, sumG, sumB, mn, mx)
  }

  /** REAL AVI decode: walk the RIFF chunk tree, validate the stream is
    * uncompressed 24-bit BI_RGB DIB video, read geometry and frame rate
    * from strf/strh, and fold every '00db'/'00dc' movi frame into exact
    * integer pixel statistics:
    * (n_frames, width, height, fps, Σr, Σg, Σb, min channel, max channel).
    * None for undecodable bytes, compressed streams, or any bpp but 24.
    */
  def decodeAvi(bytes: Array[Byte])
      : Option[(Long, Long, Long, Long, Long, Long, Long, Long, Long)] =
    parseAvi(bytes).collect { case (w, h, fps, 0, frames) =>
      // compression 0 only: raw-DIB pixel sums have no meaning for an
      // MJPEG stream — those go through mjpegPatternDeviation's per-frame
      // JPEG decode instead
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      var mn = 256L; var mx = -1L
      frames.foreach { case (off, _) =>
        val (r, g, b, lo, hi) = frameSums(bytes, off, w, h)
        sumR += r; sumG += g; sumB += b
        if (lo < mn) mn = lo
        if (hi > mx) mx = hi
      }
      (frames.size.toLong, w.toLong, h.toLong, fps.toLong,
        sumR, sumG, sumB, mn, mx)
    }

  /** Per-frame stats of every SAMPLED frame (index `% every == 0`, the
    * q61 fan-out convention on the REAL container): frame index plus its
    * exact channel sums. None for undecodable bytes — a frame fan-out of
    * an unparseable container has nothing to emit (the stats pass q252 is
    * where undecodable rows are preserved and audited).
    */
  def decodeAviFrames(bytes: Array[Byte], every: Int)
      : Option[Seq[(Long, Long, Long, Long)]] = {
    // guarded here, not only in aviFrameSamples: a direct caller with
    // every = 0 must get the contract error, not a divide-by-zero per
    // frame
    require(every >= 1, s"every must be positive, got $every")
    parseAvi(bytes).collect { case (w, h, _, 0, frames) =>
      frames.zipWithIndex.collect {
        case ((off, _), i) if i % every == 0 =>
          val (r, g, b, _, _) = frameSums(bytes, off, w, h)
          (i.toLong, r, g, b)
      }
    }
  }

  /** Deterministic REAL-AVI media fixture from the documents table: every
    * `doc_id % 3 = 2` document becomes a pattern video (the video third of
    * the media-type convention; images take % 3 = 0, audio % 3 = 1) —
    * EXCEPT `doc_id % 17 = 0` rows, which carry the document's text bytes
    * instead (not an AVI): the undecodable-blob rows the stats pass must
    * preserve with null statistics.
    */
  def aviMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 3 === 2)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          if (d % 17 == 0) {
            val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
            Row(d, "video", garbage, "application/octet-stream",
              s"synthetic://raw/$d")
          } else {
            val frames = (0 until videoFrames(d)).map { f => (x: Int, y: Int) =>
              (patternB(d)(f, x, y), patternG(d)(f, x, y), patternR(d)(f, x, y))
            }
            val avi = encodeAvi(videoWidth(d), videoHeight(d), VideoFps, frames)
            Row(d, "video", avi, "video/x-msvideo", s"synthetic://avi/$d")
          }
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val frameSampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Frame sampling over REAL AVI blobs: every `every`-th frame of each
    * video becomes a (media_id, frame_idx, Σr, Σg, Σb) row — the
    * [[sampleFrames]] fan-out shape driven by the real container parse
    * instead of the stub codec. Per-partition decode; the fan-out emits
    * fixed-width stats, never frame bytes, so nothing pixel-sized
    * shuffles. Undecodable blobs contribute no rows (q252's stats pass is
    * where they are preserved and audited).
    */
  def aviFrameSamples(media: DataFrame, every: Int = 2): DataFrame = {
    require(every >= 1, s"every must be positive, got $every")
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "video")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1))
            .flatMap(b => decodeAviFrames(b, every))
            .getOrElse(Seq.empty)
            .map { case (f, sr, sg, sb) => Row(id, f, sr, sg, sb) }
        }
      }
    spark.createDataFrame(out, frameSampleSchema)
  }

  val videoStatSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("fps", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("min_px", LongType, nullable = true),
    StructField("max_px", LongType, nullable = true)))

  // ---- COMPRESSED video tier: MJPEG-in-AVI — JPEG blobs as '00dc'
  // frames inside the same RIFF walk; the frame decode is the proven
  // javax.imageio path (q199/q223), the certification the q223
  // bounded-deviation pattern. ----

  /** Solid per-frame MJPEG test color: wrap-free linear ramps in
    * (d mod 24, f), channels distinct so a swap or colorspace bug is
    * loud. Wrap-free + solid = DC-only JPEG content whose decode error is
    * a few counts (MjpegBoundSpec certifies the bound EXHAUSTIVELY over
    * the finite reachable (d mod 24, dims, f) space).
    */
  def mjpegSolid(d: Long, f: Int): (Int, Int, Int) = (
    ((d % 24) * 10 + f * 2).toInt,
    ((d % 24) * 7 + f * 3 + 40).toInt,
    ((d % 24) * 5 + f * 5 + 90).toInt)

  /** The deviation-BREAKER frame: a pixel-level 0/255 checkerboard
    * (phase by frame parity), encoded at quality 0.25 in the fixture —
    * the over-compressed-source shape whose quantization error PROVABLY
    * breaks the bound (probed exhaustively: min deviation 34+ at q 0.25
    * vs solid max 1 at q 0.95; MjpegBoundSpec pins both over all 6
    * fixture dims × both phases). The within-bound=false branch of the
    * certification, the q223 discipline of making the FALSE verdict
    * constructible. (At quality 0.95 the JDK writer preserves even this
    * checkerboard to ±2 — high-quality JPEG alone cannot construct a
    * false verdict, which is itself a probed fact.)
    */
  def mjpegChecker(f: Int)(x: Int, y: Int): (Int, Int, Int) =
    if ((x + y + f) % 2 == 0) (255, 255, 255) else (0, 0, 0)

  /** Which closed-form pattern video id `d` carries: `% 13 = 0` rows are
    * checkerboards (deviation breakers), everything else solid ramps.
    */
  def mjpegExpected(d: Long)(f: Int, x: Int, y: Int): (Int, Int, Int) =
    if (d % 13 == 0) mjpegChecker(f)(x, y) else mjpegSolid(d, f)

  /** Encode frames as a REAL MJPEG AVI: the [[encodeAvi]] RIFF layout
    * with strh handler 'MJPG', strf biCompression 'MJPG', and each movi
    * '00dc' chunk a self-contained JPEG ([[encodeJpeg]], quality 0.95) —
    * the standard motion-JPEG container layout. Frame chunk sizes vary
    * per frame; idx1 carries the true per-frame lengths.
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
      frames: Seq[(Int, Int) => (Int, Int, Int)],
      quality: Float = 0.95f): Array[Byte] = {
    val frameData = frames.map(px => encodeJpeg(width, height, px, quality))
    val maxFrame = if (frameData.isEmpty) 0 else frameData.map(_.length).max
    buildAviContainer(width, height, fps, handler = "MJPG",
      compression = MjpgFourcc, chunkTag = "00dc", bufBytes = maxFrame,
      frameData = frameData)
  }

  /** Deterministic MJPEG media fixture: the q252 id convention
    * (`doc_id % 3 = 2` becomes video, `% 17 = 0` carries non-AVI text
    * bytes) with each video's frames JPEG-encoded — `% 13 = 0` rows carry
    * the checkerboard breaker, the rest the solid ramps.
    */
  def mjpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 3 === 2)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          if (d % 17 == 0) {
            val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
            Row(d, "video", garbage, "application/octet-stream",
              s"synthetic://raw/$d")
          } else {
            val frames = (0 until videoFrames(d)).map { f => (x: Int, y: Int) =>
              mjpegExpected(d)(f, x, y)
            }
            val q = if (d % 13 == 0) 0.25f else 0.95f
            val avi = encodeAviMjpeg(videoWidth(d), videoHeight(d), VideoFps, frames, q)
            Row(d, "video", avi, "video/x-msvideo", s"synthetic://mjpeg/$d")
          }
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  val mjpegDeviationSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("fps", LongType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("within_bound", BooleanType, nullable = true)))

  /** REAL MJPEG decode + bounded-deviation certification: walk the RIFF
    * container, decode every '00dc' JPEG blob with `javax.imageio`, and
    * compare each frame's pixels against [[mjpegExpected]] for the id —
    * within_bound is true iff EVERY frame decodes at the strf geometry
    * with max per-channel deviation ≤ `maxAbsErr` (false past the bound;
    * null when a frame blob fails to decode or disagrees with the
    * header geometry). Non-AVI/truncated/raw-DIB rows fail closed:
    * decode_ok false, stats null. Per-partition decode; blobs never
    * leave the scan.
    */
  def mjpegPatternDeviation(media: DataFrame, maxAbsErr: Int): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "video")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val parsed = Option(r.getAs[Array[Byte]](1)).flatMap(b =>
            parseAvi(b).collect { case (w, h, fps, MjpgFourcc, frames) =>
              (b, w, h, fps, frames)
            })
          parsed match {
            case None => Row(d, null, null, null, null, false, null)
            case Some((b, w, h, fps, frames)) =>
              var ok = true      // every frame decoded at header geometry
              var within = true  // ... and within the deviation bound
              // one closure per video, not per pixel
              val pat: (Int, Int, Int) => (Int, Int, Int) = mjpegExpected(d)(_, _, _)
              frames.zipWithIndex.foreach { case ((off, sz), f) =>
                // ImageIO.read THROWS on a recognized-but-corrupt JPEG
                // blob (a valid RIFF walk does not imply valid frames) —
                // that is the documented within_bound=null row, not a
                // task failure
                val img =
                  try javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(b, off, sz))
                  catch { case _: Exception => null }
                if (img == null || img.getWidth != w || img.getHeight != h)
                  ok = false
                else {
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      val (er, eg, eb) = pat(f, x, y)
                      val e = math.max(
                        math.abs(((rgb >> 16) & 0xff) - er),
                        math.max(
                          math.abs(((rgb >> 8) & 0xff) - eg),
                          math.abs((rgb & 0xff) - eb)))
                      if (e > maxAbsErr) within = false
                      x += 1
                    }
                    y += 1
                  }
                }
              }
              Row(d, frames.size.toLong, w.toLong, h.toLong, fps.toLong,
                true, if (ok) java.lang.Boolean.valueOf(within) else null)
          }
        }
      }
    spark.createDataFrame(out, mjpegDeviationSchema)
  }

  // ---- Clip-level perceptual signature (video near-dup tier): per-frame
  // dHash pooled to ONE 64-bit signature by per-bit majority vote over
  // the clip's frames, so the signature flows through the SAME
  // fingerprint family joins as text/image/audio. Container-agnostic by
  // construction: a raw BI_RGB frame pools its exact DIB pixels, an
  // MJPEG frame decodes its JPEG blob through [[imageDHash]] — the same
  // content in either container yields the same per-frame bits (the
  // fixture's cell levels always differ between horizontally adjacent
  // cells by ≥ 30 gray, vs the probed ≤ ±2 JPEG-q0.95 deviation, so no
  // comparison can flip), hence the same clip signature. ----

  /** [[imageDHash]]'s 9×8 pooling over one bottom-up BGR24 DIB frame in
    * place — the raw-AVI frame twin of the JPEG path, so both containers
    * pool through identical comparison arithmetic.
    */
  private def dibFrameDHash(
      bytes: Array[Byte], off: Int, width: Int, height: Int): Option[Long] = {
    if (width < 9 || height < 8 || width > 16384 || height > 16384) return None
    val rowBytes = (width * 3 + 3) / 4 * 4
    val sums = Array.ofDim[Long](8, 9)
    val areas = Array.ofDim[Long](8, 9)
    var dy = 0
    while (dy < height) {
      val y = height - 1 - dy // bottom-up DIB row -> image row
      val j = y * 8 / height
      var x = 0
      while (x < width) {
        val i = x * 9 / width
        val base = off + dy * rowBytes + x * 3
        sums(j)(i) += (bytes(base) & 0xff).toLong +
          (bytes(base + 1) & 0xff).toLong + (bytes(base + 2) & 0xff).toLong
        areas(j)(i) += 1L
        x += 1
      }
      dy += 1
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (sums(j)(i + 1) * areas(j)(i) > sums(j)(i) * areas(j)(i + 1))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    Some(hash)
  }

  /** 64-bit clip signature of a REAL AVI (BI_RGB or MJPEG): per-frame
    * dHash ([[dibFrameDHash]] for raw DIB chunks, [[imageDHash]] over
    * each self-contained JPEG for MJPEG chunks), pooled per bit by
    * STRICT majority over the clip's frames (ties → 0; the fixture keeps
    * frame counts odd so the vote is never tied). The majority vote is
    * what makes the signature robust to a minority of altered frames —
    * a retouched title frame does not move the clip's identity. None
    * for undecodable containers, non-AVI bytes, unsupported streams, or
    * any frame that fails to decode (a clip identity built from half the
    * frames would silently compare unequal content).
    */
  def videoClipSignature(bytes: Array[Byte]): Option[Long] =
    parseAvi(bytes).flatMap { case (w, h, _, comp, frames) =>
      // short-circuit on the first undecodable frame: decode is the
      // dominant per-blob cost, and the whole clip fails closed anyway
      val n = frames.size
      val hs = new Array[Long](n)
      var i = 0
      var ok = true
      while (i < n && ok) {
        val (off, sz) = frames(i)
        (if (comp == 0) dibFrameDHash(bytes, off, w, h)
         else imageDHash(java.util.Arrays.copyOfRange(bytes, off, off + sz))) match {
          case Some(hv) => hs(i) = hv
          case None     => ok = false
        }
        i += 1
      }
      if (!ok) None
      else {
        var sig = 0L
        var m = 0
        while (m < 64) {
          var c = 0
          hs.foreach(hv => if (((hv >> m) & 1L) == 1L) c += 1)
          if (2 * c > n) sig |= 1L << m
          m += 1
        }
        Some(sig)
      }
    }

  val clipSigSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("vsig", LongType, nullable = true)))

  /** Batched [[videoClipSignature]] over a media frame: per-partition
    * decode, undecodable blobs keep their row with a null signature,
    * blobs never leave the scan — only the 8-byte signature flows into
    * the dedup join.
    */
  def videoClipSignatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "video")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(videoClipSignature) match {
            case Some(hv) => Row(id, hv)
            case None     => Row(id, null)
          }
        }
      }
    spark.createDataFrame(out, clipSigSchema)
  }

  /** Clip-fixture geometry: fixed 18×16 (2×2-pixel cells of the 9×8
    * pooling grid — exact block pooling, and smoother than the
    * pixel-checkerboard worst case the JPEG bound was probed on) and an
    * ODD frame count `5 + 2(d mod 3)` so the majority vote never ties.
    */
  val ClipW = 18
  val ClipH = 16
  def clipFrames(d: Long): Int = (5 + 2 * (d % 3)).toInt

  /** Closed-form clip cell level for frame `t`, cell `k` of family `d`:
    * the xor-multiply mix (seed `31d + t` — injective per (family,
    * frame) since t < 31) reduced mod 4, doubled, plus a column-parity
    * bit — so horizontally ADJACENT cells always carry different levels
    * (even vs odd), every dHash comparison is strict with ≥ 30 gray of
    * margin, and the per-frame bits survive the MJPEG round-trip
    * bit-identically (probed JPEG-q0.95 deviation ≤ ±2).
    */
  def clipLevel(d: Long, t: Int, k: Int): Int = clipVariantLevel(d, 0, t, k)

  /** Near-copy cells (29 and 59 — grid rows 3 and 6, so every flipped
    * bit lands in bands 1/3 and the copy always shares bands 0/2 with
    * its original) and "cousin" cells (odd interior columns of rows
    * 2/3/6/7 — alternating, because uniformly scaling a contiguous block
    * cancels in every within-block comparison).
    */
  def clipCellIsNear(k: Int): Boolean = k == 29 || k == 59
  def clipCellIsCousin(k: Int): Boolean = {
    val r = k / 9; val c = k % 9
    (r == 2 || r == 3 || r == 6 || r == 7) && c % 2 == 1
  }

  /** [[clipLevel]] with the variant adjustment applied to the mod-4 mix
    * value (parity bit preserved, so adjacent-cell strictness holds for
    * every variant): variant 2 is the near-copy (near cells ±2 levels in
    * EVERY frame) carrying a minority cousin frame at `t = 0` — one
    * heavily-altered frame among ≥ 5 that the majority vote must
    * discard; variants 3/4 are the far cousin in every frame.
    */
  def clipVariantLevel(d: Long, variant: Int, t: Int, k: Int): Int = {
    val x1 = ((31L * d + t) * 2654435761L + k * 40503L) % 2147483647L
    val x2 = x1 ^ (x1 / 65536L)
    val x3 = (x2 * 2246822519L) % 2147483629L
    var m4 = ((x3 ^ (x3 / 8192L)) % 4L).toInt
    if (variant == 2 && clipCellIsNear(k)) m4 ^= 1
    if (((variant == 2 && t == 0) || variant == 3 || variant == 4) &&
      clipCellIsCousin(k)) m4 ^= 2
    2 * m4 + (k % 2)
  }

  /** Deterministic clip-dedup media fixture: every `doc_id % 109 = 0`
    * (> 0) document becomes a clip family —
    *   - `d`: the original as a raw BI_RGB AVI ([[encodeAvi]]);
    *   - `-(4d+1)`: THE SAME frames as MJPEG-in-AVI ([[encodeAviMjpeg]])
    *     — the cross-container duplicate, signature-identical through
    *     two entirely different codec paths;
    *   - `-(4d+2)`: raw near-copy (variant 2 — plus the minority cousin
    *     frame the majority vote discards);
    *   - `-(4d+3)`: MJPEG cousin (variant 3) — candidate by band
    *     construction, concentrated past the Hamming threshold;
    *   - `-4d`: even `d` a RAW cousin (variant 4 — signature-identical
    *     to the MJPEG cousin: a second cross-container pair); odd `d`
    *     the document's text bytes (not an AVI: the null-signature row).
    */
  def clipMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = docs
      .where(col("doc_id") % 109 === 0 && col("doc_id") > 0)
      .select("doc_id", "text")
      .rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val nf = clipFrames(d)
          def frames(variant: Int): Seq[(Int, Int) => (Int, Int, Int)] =
            (0 until nf).map { t => (x: Int, y: Int) =>
              val k = (y / (ClipH / 8)) * 9 + x / (ClipW / 9)
              val g = 20 + 30 * clipVariantLevel(d, variant, t, k)
              (g, g, g)
            }
          val last =
            if (d % 2 == 1) {
              val garbage = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
              Row(-(4 * d), "video", garbage, "application/octet-stream",
                s"synthetic://raw/$d")
            } else
              Row(-(4 * d), "video",
                encodeAvi(ClipW, ClipH, VideoFps, frames(4)),
                "video/x-msvideo", s"synthetic://clip/$d?cousin-raw")
          Seq(
            Row(d, "video", encodeAvi(ClipW, ClipH, VideoFps, frames(0)),
              "video/x-msvideo", s"synthetic://clip/$d"),
            Row(-(4 * d + 1), "video",
              encodeAviMjpeg(ClipW, ClipH, VideoFps, frames(0)),
              "video/x-msvideo", s"synthetic://clip/$d?mjpeg"),
            Row(-(4 * d + 2), "video",
              encodeAvi(ClipW, ClipH, VideoFps, frames(2)),
              "video/x-msvideo", s"synthetic://clip/$d?near"),
            Row(-(4 * d + 3), "video",
              encodeAviMjpeg(ClipW, ClipH, VideoFps, frames(3)),
              "video/x-msvideo", s"synthetic://clip/$d?cousin-mjpeg"),
            last)
        }
      }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Batched REAL decode over a video media frame — the
    * [[audioWaveformStats]] shape for AVI blobs: per-partition decode,
    * undecodable/null blobs keep their row with null stats, blobs never
    * leave the scan.
    */
  def videoPixelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .where(col("media_type") === "video")
      .select("media_id", "content")
      .rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Option(r.getAs[Array[Byte]](1)).flatMap(decodeAvi) match {
            case Some((n, w, h, fps, sr, sg, sb, mn, mx)) =>
              Row(id, n, w, h, fps, sr, sg, sb, mn, mx)
            case None =>
              Row(id, null, null, null, null, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, videoStatSchema)
  }
}
