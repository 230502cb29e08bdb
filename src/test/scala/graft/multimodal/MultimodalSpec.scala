package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  test("encodePng → decodePng roundtrip is pixel-exact") {
    val png = Multimodal.encodePng(3, 2, (x, y) => (x * 10, y * 20, x + y))
    val Some((w, h, r, g, b)) = Multimodal.decodePng(png)
    assert((w, h) == ((3, 2)))
    assert(r == 2L * (0 + 10 + 20), "r sums both rows of x*10")
    assert(g == 3L * (0 + 20), "g sums both columns of y*20")
    assert(b == (0 + 1 + 2) + (1 + 2 + 3))
  }

  test("encodeWav → decodeWav roundtrip: exact PCM stats through the real RIFF container") {
    val samples = Array[Short](-2048, 0, 5, 2047, -1)
    val wav = Multimodal.encodeWav(16000, samples)
    // sanity: it really is a RIFF/WAVE container, not raw PCM
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((sr, n, sum, sumAbs, sumSq, mn, mx)) = Multimodal.decodeWav(wav)
    assert(sr == 16000 && n == 5L)
    assert(sum == 3L && sumAbs == 4101L)
    assert(sumSq == 2048L * 2048 + 25 + 2047L * 2047 + 1)
    assert(mn == -2048L && mx == 2047L)
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
  }

  test("audioWaveformStats: undecodable blobs keep their row with null stats") {
    import spark.implicits._
    val rows = java.util.Arrays.asList(
      Row(1L, "audio", Multimodal.encodeWav(16000, Array[Short](7, -7)),
        "audio/wav", "synthetic://wav/1"),
      Row(2L, "audio", "garbage".getBytes, "audio/wav", "synthetic://wav/2"),
      Row(3L, "image", Array[Byte](1, 2), "image/png", "synthetic://png/3"))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.audioWaveformStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), "non-audio rows are out of scope")
    assert(out(1L).getLong(3) == 0L && out(1L).getLong(4) == 14L)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(2),
      "undecodable audio keeps its row with null stats")
  }

  test("encodeAvi → decodeAvi roundtrip at a PADDED width: exact pixel stats through the real RIFF container") {
    // width 10 → 30 row bytes padded to 32: exercises the DIB row-padding
    // path the certified fixture's 4-aligned widths never hit
    val (w, h, nf) = (10, 3, 2)
    def px(f: Int)(x: Int, y: Int) = (
      (3 + f * 7 + x * 5 + y * 11) % 256,
      (5 + f * 11 + x * 7 + y * 3) % 256,
      (7 + f * 3 + x * 11 + y * 5) % 256)
    val avi = Multimodal.encodeAvi(w, h, 10, (0 until nf).map(f => px(f) _))
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val Some((n, dw, dh, fps, sr, sg, sb, mn, mx)) = Multimodal.decodeAvi(avi)
    assert((n, dw, dh, fps) == ((2L, 10L, 3L, 10L)))
    // sums hand-computed from the pattern (independent of row order/padding)
    assert((sr, sg, sb) == ((3780L, 2700L, 2400L)))
    assert((mn, mx) == ((3L, 119L)))
    assert(Multimodal.decodeAvi("not a video at all".getBytes).isEmpty)
    // a TRUNCATED container must fail closed, not mis-read a partial frame
    assert(Multimodal.decodeAvi(avi.take(avi.length - 20)).isEmpty)
  }

  test("videoPixelStats: undecodable blobs keep their row with null stats; fixture matches the closed form") {
    val d = 5L // 5 % 3 == 2: a video id; 5 % 17 != 0: decodable
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(Row(d, "whatever"), Row(17L, "garbage text"),
        Row(4L, "not a video id % 3")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val out = Multimodal.videoPixelStats(Multimodal.aviMediaFromDocuments(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(5L, 17L), "only doc_id % 3 == 2 rows are videos")
    val good = out(5L)
    assert(good.getLong(1) == Multimodal.videoFrames(d).toLong)
    assert(good.getLong(2) == Multimodal.videoWidth(d).toLong)
    assert(good.getLong(3) == Multimodal.videoHeight(d).toLong)
    assert(good.getLong(4) == Multimodal.VideoFps.toLong)
    // closed-form sum check, computed independently here
    var (er, eg, eb) = (0L, 0L, 0L)
    for {
      f <- 0 until Multimodal.videoFrames(d)
      x <- 0 until Multimodal.videoWidth(d)
      y <- 0 until Multimodal.videoHeight(d)
    } {
      er += Multimodal.patternR(d)(f, x, y)
      eg += Multimodal.patternG(d)(f, x, y)
      eb += Multimodal.patternB(d)(f, x, y)
    }
    assert((good.getLong(5), good.getLong(6), good.getLong(7)) == ((er, eg, eb)))
    // 17 % 3 == 2 and 17 % 17 == 0: the text-bytes row must survive with null stats
    assert(out(17L).isNullAt(1) && out(17L).isNullAt(5),
      "undecodable video keeps its row with null stats")
  }

  test("aviFrameSamples: sampled indices only, closed-form sums, undecodable blobs fan out to nothing") {
    val d = 8L // 8 % 3 == 2: video id; 8 % 5 == 3 → 6 frames; 8 % 17 != 0
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(Row(d, "x"), Row(17L, "garbage")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val out = Multimodal
      .aviFrameSamples(Multimodal.aviMediaFromDocuments(docs), every = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // 6 frames sampled every 2nd → indices 0, 2, 4; garbage id emits nothing
    assert(out.keySet == Set((d, 0L), (d, 2L), (d, 4L)))
    // closed-form channel sums for frame 2, computed independently
    var (er, eg, eb) = (0L, 0L, 0L)
    for {
      x <- 0 until Multimodal.videoWidth(d)
      y <- 0 until Multimodal.videoHeight(d)
    } {
      er += Multimodal.patternR(d)(2, x, y)
      eg += Multimodal.patternG(d)(2, x, y)
      eb += Multimodal.patternB(d)(2, x, y)
    }
    val f2 = out((d, 2L))
    assert((f2.getLong(2), f2.getLong(3), f2.getLong(4)) == ((er, eg, eb)))
  }

  test("resizeNearest: hand-computed up- AND down-sampling via the pinned formula") {
    // source 2×1: pixels r = 100·x → [100·0, 100·1]
    val src = Multimodal.encodePng(2, 1, (x, _) => (100 * x, 0, 0))
    // UP to 4×1: srcX = x2*2 div 4 = [0,0,1,1] → r sum = 0+0+100+100
    val up = Multimodal.resizeNearest(src, 4, 1).get
    assert(Multimodal.decodePng(up).get == ((4, 1, 200L, 0L, 0L)),
      "up-sampling must repeat source pixels per srcX = x'*w div w'")
    // DOWN from 4×1 [0,50,100,150] to 2×1: srcX = x2*4 div 2 = [0,2] → 0+100
    val wide = Multimodal.encodePng(4, 1, (x, _) => (50 * x, 0, 0))
    val down = Multimodal.resizeNearest(wide, 2, 1).get
    assert(Multimodal.decodePng(down).get == ((2, 1, 100L, 0L, 0L)),
      "down-sampling must skip source pixels per the same formula")
    // identity: same dims → same pixels
    val same = Multimodal.resizeNearest(src, 2, 1).get
    assert(Multimodal.decodePng(same).get == ((2, 1, 100L, 0L, 0L)))
  }

  test("decodePatternDeviation: every verdict branch fires") {
    val spark2 = spark
    // row 3: a pattern PNG (exact); row 31: a solid JPEG (bounded err);
    // row 4: garbage bytes (decode fails); row 5: decodable PNG whose
    // dims do NOT match the id's pattern dims (deviation verdicts null)
    val rows = spark2.sparkContext.parallelize(Seq(
      Row(3L, "image",
        Multimodal.encodePng(Multimodal.patternDims(3L)._1,
          Multimodal.patternDims(3L)._2, Multimodal.patternPixel(3L)),
        "image/png", "s://p3"),
      Row(31L, "image",
        Multimodal.encodeJpeg(Multimodal.patternDims(31L)._1,
          Multimodal.patternDims(31L)._2, Multimodal.patternSolid(31L), 0.95f),
        "image/jpeg", "s://j31"),
      Row(4L, "image", Array[Byte](1, 2, 3), "image/png", "s://bad"),
      Row(5L, "image", Multimodal.encodePng(2, 2, (_, _) => (9, 9, 9)),
        "image/png", "s://dims")
    ))
    val media = spark2.createDataFrame(rows, Multimodal.mediaSchema)
    def dev(pat: Long => (Int, Int) => (Int, Int, Int)) =
      Multimodal.decodePatternDeviation(media, maxAbsErr = 2, pat)
        .collect().map(r => r.getLong(0) -> r).toMap
    val png = dev(Multimodal.patternPixel)
    assert(png(3L).getBoolean(4) && png(3L).getBoolean(5) && png(3L).getBoolean(6),
      "a lossless pattern PNG decodes bit-exactly within any bound")
    assert(!png(4L).getBoolean(4) && png(4L).isNullAt(5),
      "garbage bytes: decode_ok false, deviation verdicts null")
    assert(png(5L).getBoolean(4) && png(5L).isNullAt(5) && png(5L).isNullAt(6),
      "a dims mismatch decodes but cannot be deviation-judged")
    val solid = dev(Multimodal.patternSolid)
    assert(solid(31L).getBoolean(4) && solid(31L).getBoolean(6),
      "a solid JPEG at q=0.95 stays within the probed bound")
    // the lossy bound is a REAL constraint: judging the JPEG against the
    // wrong (gradient) pattern must blow it
    assert(!png(31L).getBoolean(6),
      "a JPEG judged against the wrong pattern must fail the bound")
  }

  test("resizeImagesReal: undecodable bytes → null content; non-images pass through") {
    val spark2 = spark
    val rows = spark2.sparkContext.parallelize(Seq(
      Row(1L, "image", Multimodal.encodePng(2, 2, (x, y) => (x, y, 0)),
        "image/png", "s://a"),
      Row(2L, "image", Array[Byte](1, 2, 3), "image/png", "s://b"), // garbage
      Row(3L, "audio", Array[Byte](9, 9), "audio/wav", "s://c")
    ))
    val media = spark2.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.resizeImagesReal(media, 4, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(Multimodal.decodePng(out(1L).getAs[Array[Byte]](2)).get._1 == 4,
      "decodable images come back resized")
    assert(out(1L).getString(3) == "image/png",
      "re-encoded rows must carry the re-encode codec's mime, not the input's")
    assert(out(2L).isNullAt(2),
      "undecodable image bytes must yield null content, not fail the partition")
    assert(out(2L).isNullAt(3),
      "null content must not keep a mime_type claiming decodable bytes")
    assert(out(3L).getAs[Array[Byte]](2).toSeq == Seq[Byte](9, 9) &&
      out(3L).getString(4) == "s://c",
      "non-image rows pass through untouched (content and uri)")
  }
}
