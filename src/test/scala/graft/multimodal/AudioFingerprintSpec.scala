package graft.multimodal

import graft.SparkSpec

/** The perceptual audio tier (q264): fingerprint invariances through the
  * REAL WAV round-trip and the closed-form bit prediction the oracle
  * replays.
  */
class AudioFingerprintSpec extends SparkSpec {

  private def clip(d: Long, gain: Int, pert: Int): Array[Byte] = {
    val n = Multimodal.audioSamples(d)
    val arr = new Array[Short](n)
    var i = 0
    while (i < n) {
      val w = (i * 65L / n).toInt
      arr(i) = (Multimodal.audioFpSample(d)(i) * gain *
        Multimodal.audioFpPerturb(pert, w)).toShort
      i += 1
    }
    Multimodal.encodeWav(16000, arr)
  }

  /** The oracle's bit derivation in miniature: expected fingerprint from
    * the closed-form window sums.
    */
  private def expected(d: Long, pert: Int): Long = {
    val n = Multimodal.audioSamples(d)
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    for (i <- 0 until n) {
      val w = (i * 65L / n).toInt
      sums(w) += math.abs(Multimodal.audioFpSample(d)(i).toLong) *
        Multimodal.audioFpPerturb(pert, w)
      cnts(w) += 1
    }
    (0 until 64).foldLeft(0L) { (h, m) =>
      if (sums(m + 1) * cnts(m) > sums(m) * cnts(m + 1)) h | (1L << m) else h
    }
  }

  test("fingerprint is gain-invariant through the real WAV round-trip and matches the closed form") {
    for (d <- Seq(103L, 206L, 309L, 412L, 515L)) {
      val want = expected(d, pert = 0)
      assert(Multimodal.audioFingerprint(clip(d, 1, 0)).contains(want), s"x1 d=$d")
      assert(Multimodal.audioFingerprint(clip(d, 2, 0)).contains(want), s"x2 d=$d")
      assert(Multimodal.audioFingerprint(clip(d, 3, 0)).contains(want), s"x3 d=$d")
    }
  }

  test("perturbed and cousin clips match their closed-form bits and stay inside bands 1 and 3") {
    val mask = 0x0000ffff0000ffffL // bands 0 and 2
    for (d <- Seq(206L, 412L, 1030L)) {
      val base = expected(d, 0)
      val pert = expected(d, 1)
      val cous = expected(d, 2)
      assert(Multimodal.audioFingerprint(clip(d, 1, 1)).contains(pert))
      assert(Multimodal.audioFingerprint(clip(d, 1, 2)).contains(cous))
      assert((base & mask) == (pert & mask))
      assert((base & mask) == (cous & mask))
      assert(java.lang.Long.bitCount(base ^ pert) <= 4)
    }
  }

  test("non-WAV and too-short inputs fingerprint to None") {
    assert(Multimodal.audioFingerprint("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.audioFingerprint(
      Multimodal.encodeWav(16000, Array.fill[Short](64)(100))).isEmpty)
  }
}
