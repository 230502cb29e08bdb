package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static per-row kernels shared by the signature expressions' interpreted
  * (`nullSafeEval`) and generated (`doGenCode`) paths.
  *
  * A top-level object compiles to a class with static forwarders, so
  * whole-stage-generated Java can call `graft.functions.SigKernels.x(...)`
  * directly — the expressions stay inside WholeStageCodegen (no
  * `CodegenFallback` row materialization + interpreted dispatch in the LSH
  * hot path). Both paths run the exact same kernel, so bit-parity with the
  * HOF formulations (and the DuckDB oracle) is preserved by construction.
  */
object SigKernels {

  private val P = Sha60.Mersenne31

  /** MinHash signature: one pass over the shingle hashes updating all
    * `numHashes` permutation minima (see MinHashSignatureExpr).
    */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val minima = Array.fill(numHashes)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val raw = Sha60.hashBytes(arr.getUTF8String(i).getBytes)
        val h = raw % P // raw is non-negative (60-bit)
        var j = 0
        while (j < numHashes) {
          val v = ((2L * j + 1) * h + 104729L * (j + 1)) % P
          if (v < minima(j)) minima(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(minima)
  }

  /** 64-bit SimHash: ±1 votes per bit of each token's Sha60 hash. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Long](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Sha60.hashBytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1L else votes(b) -= 1L
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0L) fp |= (1L << b)
      b += 1
    }
    fp
  }

  // Hyperplane sign matrix cache keyed by (nPlanes, dim): plane components
  // are deterministic Sha60 values, so the hash work is O(nPlanes·d) once
  // per JVM, not per row.
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  private def signsFor(nPlanes: Int, d: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(
      (nPlanes.toLong << 32) | d.toLong,
      _ =>
        Array.tabulate(nPlanes) { p =>
          Array.tabulate(d) { i =>
            if (Sha60.hashString(s"$p:$i") % 2 == 0) 1.0 else -1.0
          }
        })

  /** Winnowed fingerprints (MOSS): distinct minima of every `w`-window over
    * the shingle-hash sequence, first-occurrence order; one global minimum
    * when the document has fewer than `w` shingle hashes; empty for no
    * shingles — exactly the semantics of
    * [[graft.operators.Dedup.winnowedFingerprints]]'s HOF formulation, kept
    * as this kernel's bit-parity oracle.
    *
    * O(L) via a monotonic index deque (each position enters and leaves the
    * deque once) where the HOF slice/array_min shape is O(L·w) with a
    * w-element array allocation per position.
    */
  def winnow(arr: ArrayData, w: Int): ArrayData = {
    val n0 = arr.numElements()
    val hs = new Array[Long](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) {
        hs(n) = Sha60.hashBytes(arr.getUTF8String(i).getBytes) % P
        n += 1
      }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var m = hs(0)
      var j = 1
      while (j < n) { if (hs(j) < m) m = hs(j); j += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val seen = new java.util.HashSet[java.lang.Long]()
    val deque = new Array[Int](n) // monotonic indices, window [head, tail)
    var head = 0
    var tail = 0
    var j = 0
    while (j < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) {
        val m = hs(deque(head))
        if (seen.add(m)) out += m
      }
      j += 1
    }
    new GenericArrayData(out.result())
  }

  /** Random-hyperplane LSH signature: sign bits of the projections onto the
    * Sha60-derived ±1 planes, packed into a Long. Per-plane accumulation is
    * in ascending index order — bit-identical to the sequential left fold of
    * the HOF/oracle formulation.
    */
  def hyperplane(arr: ArrayData, nPlanes: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    val signs = signsFor(nPlanes, n)
    val projections = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var p = 0
      while (p < nPlanes) {
        projections(p) += x * signs(p)(i)
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      if (projections(p) >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
