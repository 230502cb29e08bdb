package graft.multimodal

import graft.SparkSpec

/** The clip-level perceptual signature (q266 tier): per-frame dHash
  * pooled by strict per-bit majority, container-agnostic across raw
  * BI_RGB AVI and MJPEG-in-AVI.
  */
class VideoClipSpec extends SparkSpec {

  private def cellPx(lv: Int => Int)(x: Int, y: Int): (Int, Int, Int) = {
    val k = (y / (Multimodal.ClipH / 8)) * 9 + x / (Multimodal.ClipW / 9)
    val g = 20 + 30 * lv(k)
    (g, g, g)
  }

  private def framesOf(d: Long, variant: Int) =
    (0 until Multimodal.clipFrames(d)).map { t =>
      cellPx(Multimodal.clipVariantLevel(d, variant, t, _)) _
    }

  test("cross-container: raw AVI and MJPEG of the same frames signature-collide exactly") {
    // the JVM-side probe of the JPEG-roundtrip bit-preservation claim:
    // every family in the smallest fixture id range, both parities and
    // all three frame counts, plus deeper ids — exact equality, not a
    // Hamming bound
    for (d <- Seq(109L, 218L, 327L, 436L, 545L, 654L, 763L, 872L, 981L, 1090L)) {
      val raw = Multimodal.encodeAvi(
        Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 0))
      val mj = Multimodal.encodeAviMjpeg(
        Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 0))
      val sr = Multimodal.videoClipSignature(raw)
      val sm = Multimodal.videoClipSignature(mj)
      assert(sr.isDefined && sr == sm, s"d=$d raw=$sr mjpeg=$sm")
    }
  }

  test("majority vote: a minority altered frame is discarded, a majority is not") {
    val d = 218L // 9 frames
    val base = Multimodal.videoClipSignature(Multimodal.encodeAvi(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 0))).get
    // variant 2: near cells flipped in EVERY frame (survives the vote),
    // cousin cells flipped ONLY in frame 0 (1 of 9 — discarded)
    val near = Multimodal.videoClipSignature(Multimodal.encodeAvi(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 2))).get
    val dNearBase = java.lang.Long.bitCount(base ^ near)
    assert(dNearBase >= 1 && dNearBase <= 4,
      s"near-copy must differ only by the per-frame near bits, got $dNearBase")
    // bands 0 and 2 (bits 0-15, 32-47) untouched — the guaranteed-candidacy bands
    assert(((base ^ near) & 0x0000ffff0000ffffL) == 0L)
    // majority flips when the SAME cousin alteration covers most frames:
    // variant 3 applies it to every frame, and its distance concentrates
    // past the near-copy's
    val cousin = Multimodal.videoClipSignature(Multimodal.encodeAviMjpeg(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 3))).get
    assert(java.lang.Long.bitCount(base ^ cousin) > dNearBase)
    assert(((base ^ cousin) & 0x0000ffff0000ffffL) == 0L)
  }

  test("raw and MJPEG cousins collide (the second cross-container pair)") {
    val d = 436L
    val raw = Multimodal.videoClipSignature(Multimodal.encodeAvi(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 4)))
    val mj = Multimodal.videoClipSignature(Multimodal.encodeAviMjpeg(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(d, 3)))
    assert(raw.isDefined && raw == mj)
  }

  test("non-AVI, truncated, and partially undecodable clips fail closed") {
    assert(Multimodal.videoClipSignature("not an avi".getBytes("UTF-8")).isEmpty)
    val good = Multimodal.encodeAvi(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(109L, 0))
    assert(Multimodal.videoClipSignature(
      java.util.Arrays.copyOfRange(good, 0, good.length / 2)).isEmpty)
    // an MJPEG container whose second frame blob is corrupted: the RIFF
    // walk still parses, the frame decode must fail the WHOLE clip
    val mj = Multimodal.encodeAviMjpeg(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, framesOf(109L, 0))
    // find the second JPEG SOI marker and stomp the bytes after it
    var soi = 0; var seen = 0
    for (i <- 0 until mj.length - 1 if seen < 2) {
      if ((mj(i) & 0xff) == 0xff && (mj(i + 1) & 0xff) == 0xd8) { seen += 1; soi = i }
    }
    assert(seen >= 2, "fixture must contain at least two JPEG frames")
    val bad = mj.clone()
    for (i <- soi + 2 until math.min(soi + 40, bad.length)) bad(i) = 0
    assert(Multimodal.videoClipSignature(bad).isEmpty)
  }

  test("single-frame raw clip signature equals the PNG dHash of the same pattern") {
    // the DIB pooling path and the javax.imageio pooling path agree on
    // identical pixels — a one-frame clip IS its frame's dHash
    val d = 327L
    val px = cellPx(Multimodal.clipLevel(d, 0, _)) _
    val clip = Multimodal.encodeAvi(
      Multimodal.ClipW, Multimodal.ClipH, Multimodal.VideoFps, Seq(px))
    val png = Multimodal.encodePng(Multimodal.ClipW, Multimodal.ClipH, px)
    assert(Multimodal.videoClipSignature(clip) == Multimodal.imageDHash(png))
  }
}
