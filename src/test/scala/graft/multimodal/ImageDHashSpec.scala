package graft.multimodal

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The perceptual image tier (q259): difference-hash invariances through
  * the REAL codec path, the closed-form bit prediction the oracle replays,
  * and the banded pair join's contract.
  */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  private def gray(levf: Int => Int, w: Int, h: Int)(x: Int, y: Int) = {
    val g = 20 + 30 * levf((y / (h / 8)) * 9 + x / (w / 9))
    (g, g, g)
  }

  /** The oracle's bit derivation, in miniature: expected dHash from cell
    * levels alone.
    */
  private def expectedHash(levf: Int => Int): Long = {
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (levf(j * 9 + i + 1) > levf(j * 9 + i)) hash |= 1L << (j * 8 + i)
    hash
  }

  test("dHash is invariant under BMP re-encode and 2x nearest resize, and matches the closed form") {
    for (d <- Seq(101L, 202L, 303L, 404L, 505L)) {
      val (w, h) = Multimodal.dhashDims(d)
      val png = Multimodal.encodePng(w, h, gray(Multimodal.dhashLevel(d, _), w, h))
      val bmp = Multimodal.encodeBmp(w, h, gray(Multimodal.dhashLevel(d, _), w, h))
      val x2 = Multimodal.resizeNearest(png, 2 * w, 2 * h).get
      val want = expectedHash(Multimodal.dhashLevel(d, _))
      assert(Multimodal.imageDHash(png).contains(want), s"png d=$d")
      assert(Multimodal.imageDHash(bmp).contains(want), s"bmp d=$d")
      assert(Multimodal.imageDHash(x2).contains(want), s"resized d=$d")
    }
  }

  test("perturbed and cousin copies match their closed-form bits; perturbation stays inside bands 1 and 3") {
    for (d <- Seq(202L, 404L, 1010L)) {
      val (w, h) = Multimodal.dhashDims(d)
      val base = expectedHash(Multimodal.dhashLevel(d, _))
      val pert = expectedHash(Multimodal.dhashPerturbedLevel(d, _))
      val cous = expectedHash(Multimodal.dhashCousinLevel(d, _))
      val pertPng = Multimodal.encodePng(w, h, gray(Multimodal.dhashPerturbedLevel(d, _), w, h))
      val cousPng = Multimodal.encodePng(w, h, gray(Multimodal.dhashCousinLevel(d, _), w, h))
      assert(Multimodal.imageDHash(pertPng).contains(pert))
      assert(Multimodal.imageDHash(cousPng).contains(cous))
      // bands 0 and 2 (bits 0-15, 32-47) are untouched by BOTH planted
      // variants — the guaranteed-candidate construction
      val mask = 0x0000ffff0000ffffL
      assert((base & mask) == (pert & mask))
      assert((base & mask) == (cous & mask))
      assert(java.lang.Long.bitCount(base ^ pert) <= 4)
    }
  }

  test("undecodable, undersized, and oversized inputs hash to None") {
    assert(Multimodal.imageDHash("not an image".getBytes("UTF-8")).isEmpty)
    // 8x8 is below the 9-column pooling grid
    val tiny = Multimodal.encodePng(8, 8, (_, _) => (1, 2, 3))
    assert(Multimodal.imageDHash(tiny).isEmpty)
  }

  test("floor pooling on non-grid-multiple dims equals a brute-force reference") {
    val d = 77L
    val (w, h) = (13, 11) // not multiples of 9/8: exercises floor pooling
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val g = (x * 37 + y * 91 + d).toInt % 256
      (g, (g * 3) % 256, (g * 7) % 256)
    }
    val png = Multimodal.encodePng(w, h, px)
    val sums = Array.ofDim[Long](8, 9)
    val areas = Array.ofDim[Long](8, 9)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      sums(y * 8 / h)(x * 9 / w) += (r & 0xff) + (g & 0xff) + (b & 0xff)
      areas(y * 8 / h)(x * 9 / w) += 1L
    }
    var want = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (sums(j)(i + 1) * areas(j)(i) > sums(j)(i) * areas(j)(i + 1))
        want |= 1L << (j * 8 + i)
    assert(Multimodal.imageDHash(png).contains(want))
  }

  test("fingerprintsAgainstIndex equals brute force: delta probes corpus only, corpus never self-pairs") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 40L).map(i => (i, rnd.nextLong())) :+ ((50L, 99L))
    val delta = (101L to 120L).map(i => (i, rnd.nextLong())) ++
      Seq((201L, 99L), (202L, 99L ^ 5L)) // planted: exact + Hamming-2 hits
    val idx = Dedup.fingerprintCorpusIndex(corpus.toDF("id", "fp"), "id", "fp")
    val got = Dedup.fingerprintsAgainstIndex(idx, delta.toDF("id", "fp"), "id", "fp", maxHamming = 8)
      .orderBy("delta_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    def bands(v: Long) = (0 until 4).map(q => (q, (v >>> (q * 16)) & 0xffffL))
    val want = (for {
      (ic, fc) <- corpus; (id, fd) <- delta
      if bands(fc).intersect(bands(fd)).nonEmpty
      hd = java.lang.Long.bitCount(fc ^ fd) if hd <= 8
    } yield (id, ic, hd)).sortBy(p => (p._1, p._2))
    assert(got.nonEmpty && got == want)
    // the planted pairs are found through the standing index
    assert(got.contains((201L, 50L, 0)) && got.contains((202L, 50L, 2)))
    // no delta-delta pair can appear: every corpus_id is a corpus id
    assert(got.forall(_._2 <= 50L))
  }

  test("fingerprintNearDuplicates equals brute force restricted to band-sharing pairs") {
    val rnd = new scala.util.Random(42)
    val fps = (1L to 60L).map(i => (i, rnd.nextLong())) ++
      Seq((101L, 7L), (102L, 7L), (103L, 7L ^ 3L)) // planted near family
    val df = fps.toDF("id", "fp")
    val got = Dedup.fingerprintNearDuplicates(df, "id", "fp", maxHamming = 8)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    def bands(v: Long) = (0 until 4).map(q => (q, (v >>> (q * 16)) & 0xffffL))
    val want = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      if bands(fa).intersect(bands(fb)).nonEmpty
      hd = java.lang.Long.bitCount(fa ^ fb) if hd <= 8
    } yield (ia, ib, hd)).sortBy(p => (p._1, p._2))
    assert(got.nonEmpty && got == want)
    // null fingerprints are excluded, not joined
    val withNull = df.unionByName(
      Seq((999L, Option.empty[Long])).toDF("id", "fp"))
    val gotNull = Dedup.fingerprintNearDuplicates(withNull, "id", "fp", maxHamming = 8)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(gotNull == want)
  }
}
