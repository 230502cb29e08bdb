package graft.multimodal

import graft.SparkSpec

/** The 128-bit image dHash (9×16 grid, two longs) — the band-saturation
  * mitigation's image-tier producer.
  */
class ImageDHash128Spec extends SparkSpec {

  private def px(d: Long, levf: Int => Int)(w: Int, h: Int)(x: Int, y: Int) = {
    val g = 20 + 30 * levf((y / (h / 16)) * 9 + x / (w / 9))
    (g, g, g)
  }

  test("BMP re-encode and 2x nearest resize hash bit-identically") {
    for (d <- Seq(113L, 226L, 339L, 452L)) {
      val (w, h) = Multimodal.dhash128Dims(d)
      val png = Multimodal.encodePng(w, h, px(d, Multimodal.dhashLevel(d, _))(w, h))
      val bmp = Multimodal.encodeBmp(w, h, px(d, Multimodal.dhashLevel(d, _))(w, h))
      val x2 = Multimodal.resizeNearest(png, 2 * w, 2 * h).get
      val base = Multimodal.imageDHash128(png)
      assert(base.isDefined, s"d=$d")
      assert(Multimodal.imageDHash128(bmp) == base, s"d=$d BMP")
      assert(Multimodal.imageDHash128(x2) == base, s"d=$d 2x")
    }
  }

  test("perturbed near-copy: <= 4 bits, all inside 32-bit bands 1 and 3") {
    // a ±1 level flip on cells 47/122 changes 0-4 comparisons depending
    // on the neighbors' levels (0 is legitimate: the copy is then an
    // exact dup), so assert the band confinement per id and the nonzero
    // case over the set
    val dists = for (d <- (1L to 8L).map(_ * 113L)) yield {
      val (w, h) = Multimodal.dhash128Dims(d)
      val (bh, bl) = Multimodal.imageDHash128(
        Multimodal.encodePng(w, h, px(d, Multimodal.dhashLevel(d, _))(w, h))).get
      val (ph, pl) = Multimodal.imageDHash128(
        Multimodal.encodePng(w, h, px(d, Multimodal.dhash128PerturbedLevel(d, _))(w, h))).get
      val dist = java.lang.Long.bitCount(bh ^ ph) + java.lang.Long.bitCount(bl ^ pl)
      assert(dist <= 4, s"d=$d dist=$dist")
      // bands 0 (lo bits 0-31) and 2 (hi bits 0-31) must be clean —
      // the guaranteed-candidacy bands of the 4x32 blocking
      assert(((bl ^ pl) & 0xffffffffL) == 0L, s"d=$d band 0 dirty")
      assert(((bh ^ ph) & 0xffffffffL) == 0L, s"d=$d band 2 dirty")
      dist
    }
    assert(dists.max >= 1, s"no id in the probe set flipped a bit: $dists")
  }

  test("cousin stays a guaranteed candidate: bands 0 and 2 clean, distance past the near-copy's") {
    val d = 226L // even id: the cousin variant exists in the fixture
    val (w, h) = Multimodal.dhash128Dims(d)
    val (bh, bl) = Multimodal.imageDHash128(
      Multimodal.encodePng(w, h, px(d, Multimodal.dhashLevel(d, _))(w, h))).get
    val (ch, cl) = Multimodal.imageDHash128(
      Multimodal.encodePng(w, h, px(d, Multimodal.dhash128CousinLevel(d, _))(w, h))).get
    assert(((bl ^ cl) & 0xffffffffL) == 0L)
    assert(((bh ^ ch) & 0xffffffffL) == 0L)
    assert(java.lang.Long.bitCount(bh ^ ch) + java.lang.Long.bitCount(bl ^ cl) > 4)
  }

  test("images below the 9x16 grid and garbage bytes yield None") {
    // 9x8 satisfies the 64-bit grid but NOT the 16-row one
    val small = Multimodal.encodePng(9, 8, (_, _) => (100, 100, 100))
    assert(Multimodal.imageDHash(small).isDefined)
    assert(Multimodal.imageDHash128(small).isEmpty)
    assert(Multimodal.imageDHash128("not an image".getBytes("UTF-8")).isEmpty)
  }
}
