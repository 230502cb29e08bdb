package graft.multimodal

import graft.SparkSpec

/** Pins the q260 deviation bound EXHAUSTIVELY: the MJPEG fixture's solid
  * ramps and checkerboard breakers both live in finite reachable spaces
  * (colors are functions of d mod 24 and f; dims of d mod 9 / mod 2;
  * frame counts of d mod 5), so the bound is certified over EVERY
  * (color, dims) combination any scale factor can produce — not sampled.
  */
class MjpegBoundSpec extends SparkSpec {

  private def maxDev(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
      quality: Float = 0.95f): Int = {
    val bytes = Multimodal.encodeJpeg(w, h, px, quality)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    var m = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val (er, eg, eb) = px(x, y)
      m = math.max(m, math.max(
        math.abs(((rgb >> 16) & 0xff) - er),
        math.max(
          math.abs(((rgb >> 8) & 0xff) - eg),
          math.abs((rgb & 0xff) - eb))))
    }
    m
  }

  test("every reachable solid (color, dims) decodes within the bound; every checkerboard breaks it") {
    // d mod 360 covers (d mod 24) x (d mod 9) x (d mod 2) x (d mod 5)
    // jointly (360 = lcm); probing all 360 residues is a superset of the
    // ids any fixture scale can produce
    var solidMax = 0
    for (d <- 0L until 360L; f <- 0 until Multimodal.videoFrames(d)) {
      val w = Multimodal.videoWidth(d)
      val h = Multimodal.videoHeight(d)
      val (r, g, b) = Multimodal.mjpegSolid(d, f)
      solidMax = math.max(solidMax, maxDev(w, h, (_, _) => (r, g, b)))
    }
    var checkerMin = Int.MaxValue
    for (d <- 0L until 18L; f <- 0 until 2) { // dims cycle with lcm(9,2)=18
      val w = Multimodal.videoWidth(d)
      val h = Multimodal.videoHeight(d)
      // the fixture's breaker quality (0.25): over-compression is what
      // constructs the false verdict — at 0.95 even this checkerboard
      // round-trips to +-2 (probed), so quality is part of the fixture
      checkerMin = math.min(checkerMin, maxDev(w, h, Multimodal.mjpegChecker(f), 0.25f))
    }
    info(s"solid max deviation = $solidMax, checker min deviation = $checkerMin")
    assert(solidMax <= 16, s"solid ramps must stay within the q260 bound, got $solidMax")
    assert(checkerMin > 16, s"checkerboards must break the q260 bound, got $checkerMin")
  }

  test("MJPEG AVI round-trips: geometry/fps/frame count from headers, every frame within bound; BI_RGB path unchanged") {
    val d = 5L
    val frames = (0 until Multimodal.videoFrames(d)).map { f => (x: Int, y: Int) =>
      Multimodal.mjpegExpected(d)(f, x, y)
    }
    val avi = Multimodal.encodeAviMjpeg(
      Multimodal.videoWidth(d), Multimodal.videoHeight(d), Multimodal.VideoFps, frames)
    import spark.implicits._
    val media = Seq((d, "video", avi, "video/x-msvideo", "t://5"))
      .toDF("media_id", "media_type", "content", "mime_type", "source_uri")
    val row = Multimodal.mjpegPatternDeviation(media, maxAbsErr = 16).head()
    assert(row.getLong(1) == Multimodal.videoFrames(d).toLong)
    assert(row.getLong(2) == Multimodal.videoWidth(d).toLong)
    assert(row.getLong(3) == Multimodal.videoHeight(d).toLong)
    assert(row.getLong(4) == Multimodal.VideoFps.toLong)
    assert(row.getBoolean(5) && row.getBoolean(6))
    // an MJPEG container must NOT decode through the raw-DIB stats path
    assert(Multimodal.decodeAvi(avi).isEmpty)
    assert(Multimodal.decodeAviFrames(avi, 2).isEmpty)
    // and a truncated container fails closed
    val trunc = java.util.Arrays.copyOf(avi, avi.length / 2)
    val mediaT = Seq((d, "video", trunc, "video/x-msvideo", "t://t"))
      .toDF("media_id", "media_type", "content", "mime_type", "source_uri")
    val rowT = Multimodal.mjpegPatternDeviation(mediaT, maxAbsErr = 16).head()
    assert(!rowT.getBoolean(5) && rowT.isNullAt(6) && rowT.isNullAt(1))
  }

  test("decodeAviFrames rejects every = 0 with the contract error") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(Array[Byte](1, 2, 3), 0)
    }
    assert(e.getMessage.contains("every"))
  }
}
