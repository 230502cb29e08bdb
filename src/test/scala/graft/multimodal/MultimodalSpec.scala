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
