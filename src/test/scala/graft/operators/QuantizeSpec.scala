package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("scalarQuantize: hand-computed codes, endpoints hit -128/127") {
    val df = Seq(
      (1L, Seq(0.0f, 10.0f, 7.0f)),
      (2L, Seq(5.0f, 20.0f, 7.0f)),
      (3L, Seq(10.0f, 30.0f, 7.0f))   // dim 2 is degenerate (constant)
    ).toDF("vec_id", "embedding")
    val params = Quantize.collectParams(df, "embedding")
    assert(params == Seq((0.0, 10.0), (10.0, 30.0), (7.0, 7.0)))
    val codes = Quantize.scalarQuantize(df, "vec_id", "embedding", params)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(codes(1L) == List(-128L, -128L, -128L), "min maps to -128; degenerate pinned")
    assert(codes(2L) == List(0L, 0L, -128L), "midpoint maps to 0")
    assert(codes(3L) == List(127L, 127L, -128L), "max maps to 127")
  }

  test("encodeLocal (driver) == scalarQuantize (executor) bit-for-bit") {
    val df = Seq(
      (1L, Seq(0.13f, -2.7f, 9.81f)),
      (2L, Seq(1.62f, 3.14f, -0.58f)),
      (3L, Seq(-7.4f, 0.0f, 2.72f))
    ).toDF("vec_id", "embedding")
    val params = Quantize.collectParams(df, "embedding")
    val dist = Quantize.scalarQuantize(df, "vec_id", "embedding", params)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val rows = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
    rows.foreach { case (id, v) =>
      assert(Quantize.encodeLocal(v, params).toList == dist(id),
        s"driver and executor encodes must agree for $id")
    }
  }

  test("refreshParams merges min/max; calibrationDrift flags moved ranges only") {
    val base = Seq(
      (1L, Seq(0.0f, 5.0f, 1.0f)),
      (2L, Seq(10.0f, 8.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val delta = Seq(
      (3L, Seq(4.0f, 9.0f, 1.5f))   // dim0 inside, dim1 extends max, dim2 inside
    ).toDF("vec_id", "embedding")
    val bp = Quantize.quantizationParams(base, "embedding")
    val merged = Quantize.refreshParams(bp, delta, "embedding")
      .orderBy("dim").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(merged.toList == List((0L, 0.0, 10.0), (1L, 5.0, 9.0), (2L, 1.0, 2.0)))
    // merge == rebuild from the union
    val rebuilt = Quantize.quantizationParams(base.unionByName(delta), "embedding")
      .orderBy("dim").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(merged.toList == rebuilt.toList)
    val drift = Quantize.calibrationDrift(bp, delta, "embedding")
      .orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(5))).toList
    assert(drift == List((0L, 0L), (1L, 1L), (2L, 0L)),
      "only the dimension whose range moved is flagged")
  }

  test("meanPool: hand-computed means, partition-invariant fixed-point sums") {
    val chunks = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(0.5f, 0.25f))
    ).toDF("group_id", "embedding")
    def run(parts: Int) = Similarity.meanPool(chunks.repartition(parts), "group_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val one = run(1)
    assert(run(5) == one, "fixed-point decimal sums must not depend on partitioning")
    val m = one.map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(m((1L, 0L)) == ((2.0, 2L)) && m((1L, 1L)) == ((1.0, 2L)))
    assert(m((2L, 0L)) == ((0.5, 1L)) && m((2L, 1L)) == ((0.25, 1L)))
  }

  test("ivfSq8TopK: unprobed lists are pruned even when their dots would win") {
    // cluster A along +x, cluster B along +y; query points at +y, so with
    // nProbe=1 only B's list is scanned — vector 30 in A has a HIGH dot
    // with the query's codes but must never appear
    val df = Seq(
      (10L, Seq(0.1f, 0.9f, 0.0f)),   // B
      (11L, Seq(0.2f, 0.8f, 0.0f)),   // B
      (30L, Seq(0.9f, 0.6f, 0.0f)),   // A (x-dominant) but y-heavy too
      (31L, Seq(1.0f, 0.0f, 0.0f))    // A
    ).toDF("vec_id", "embedding")
    val cents = Seq(1 -> Seq(1.0, 0.0, 0.0), 2 -> Seq(0.0, 1.0, 0.0))
    val params = Quantize.collectParams(df, "embedding")
    val q = Seq(0.0, 1.0, 0.0)
    val out = Similarity.ivfSq8TopK(df, "vec_id", "embedding", cents, params,
      q, k = 4, nProbe = 1).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L),
      s"only the probed list's vectors may appear: ${out.map(_.getLong(1)).toSeq}")
    assert(out.forall(_.getInt(2) == 2), "every hit comes from the probed cluster")
    // widening the probe recovers the pruned list
    val wide = Similarity.ivfSq8TopK(df, "vec_id", "embedding", cents, params,
      q, k = 4, nProbe = 2).collect()
    assert(wide.map(_.getLong(1)).toSet == Set(10L, 11L, 30L, 31L))
    // scores are the exact integer code dots
    val qc = Quantize.encodeLocal(q, params)
    val codes = Quantize.scalarQuantize(df, "vec_id", "embedding", params)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    wide.foreach { r =>
      val want = codes(r.getLong(1)).zip(qc).map { case (a, b) => a * b }.sum
      assert(r.getLong(3) == want)
    }
  }

  test("signBits: hand-computed packing across the 32-bit word boundary") {
    // 34 dims: bits 0, 31 (word-0 extremes) and 32, 33 (word 1) set
    val v = Array.fill(34)(-1.0)
    v(0) = 1.0; v(31) = 0.5; v(32) = 2.0; v(33) = 0.1
    val df = Seq((1L, v.toSeq.map(_.toFloat))).toDF("vec_id", "embedding")
    val words = df.select(Quantize.signBitsCol($"embedding", 34)).head.getSeq[Long](0)
    assert(words == Seq(1L + (1L << 31), 1L + 2L), "bit 31 stays in word 0, bit 32 starts word 1")
    assert(Quantize.signBitsLocal(v.toIndexedSeq, 34) == words,
      "driver packing must equal the column expression")
    // zero is NOT positive — its bit stays clear
    val z = Seq((2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(Quantize.signBitsCol($"embedding", 2)).head.getSeq[Long](0)
    assert(z == Seq(2L))
  }

  test("hammingCol: popcount of the XOR, summed across words") {
    val df = Seq((Seq(0L, 0L), Seq(5L, 1L))).toDF("a", "b") // 101 and 1 → 3 bits
    assert(df.select(Quantize.hammingCol($"a", $"b", 2)).head.getLong(0) == 3L)
  }

  test("binaryTopK: coarse Hamming prunes, exact cosine re-ranks the survivors") {
    // query +x. id 1 near +x; id 2 shares NO sign bit with the query
    // (high Hamming) despite decent cosine; id 3 shares signs but has a
    // worse cosine than 1. coarseK=2 keeps {1,3} (Hamming 0) and prunes 2.
    val df = Seq(
      (0L, Seq(1.0f, 1.0f, -1.0f)),
      (1L, Seq(0.9f, 0.8f, -0.2f)),    // hamming 0, best cosine
      (2L, Seq(-0.1f, -0.1f, 0.9f)),   // hamming 3 — pruned by coarse
      (3L, Seq(0.1f, 2.0f, -0.1f))     // hamming 0, weaker cosine
    ).toDF("vec_id", "embedding")
    val q = Seq(1.0, 1.0, -1.0)
    val out = Quantize.binaryTopK(df, "vec_id", "embedding", q,
      k = 3, coarseK = 2, excludeId = Some(0L)).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L),
      s"coarse stage must prune id 2: ${out.map(_.getLong(1)).toSeq}")
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), "dense b_rank")
    assert(out.forall(_.getLong(2) == 0L), "survivors share every sign bit")
    assert(out.head.getDouble(3) > out.last.getDouble(3), "exact cosine orders the survivors")
    // widening the coarse stage recovers id 2 at the bottom
    val wide = Quantize.binaryTopK(df, "vec_id", "embedding", q,
      k = 3, coarseK = 3, excludeId = Some(0L)).collect()
    assert(wide.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
  }

  test("quantizedTopK: integer scores rank correctly, exact cosine attached") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),    // query
      (1L, Seq(0.9f, 0.1f)),    // close
      (2L, Seq(0.5f, 0.5f)),    // mid
      (3L, Seq(-1.0f, 1.0f))    // far
    ).toDF("vec_id", "embedding")
    val params = Quantize.collectParams(df, "embedding")
    val q = Seq(1.0, 0.0)
    val out = Quantize.quantizedTopK(df, "vec_id", "embedding", q, params,
      k = 3, excludeId = Some(0L)).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L), "quantized order matches geometry")
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "dense ranks")
    // scores are the exact integer dots of the int8 codes
    val codes = Quantize.scalarQuantize(df, "vec_id", "embedding", params)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val qc = Quantize.encodeLocal(q, params)
    out.foreach { r =>
      val want = codes(r.getLong(1)).zip(qc).map { case (a, b) => a * b }.sum
      assert(r.getLong(2) == want, s"qscore must be the exact integer dot for ${r.getLong(1)}")
    }
    // exact cosine rides along for the picked rows
    assert(out.head.getDouble(3) > 0.9 && out.last.getDouble(3) < 0.0)
  }
}
