package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineFast

/** Int8 scalar quantization of embedding columns — the memory-bound ANN
  * path: per-dimension min/max calibration, a map-only encode to int8
  * codes (4× smaller than float32, 8× than float64; integer SIMD dot
  * products), and quantized top-k retrieval scored entirely in exact
  * integer arithmetic.
  *
  * Cross-engine contract: calibration emits RAW column min/max (no
  * arithmetic → bit-exact); the encode is one pinned-order float
  * expression per component ending in `floor` (exactly rounded), clamped
  * to [0, 255] and shifted to [−128, 127]; retrieval scores are BIGINT
  * sums of code products — integer addition is exact and
  * order-independent, so the ranking needs no fold-order pinning at all.
  *
  * Scale shape: calibration is ONE posexplode + per-dimension min/max
  * (map-side combined, d rows of final state); only the d-row parameter
  * table reaches the driver (the bounded-artifact precedent of the IVF
  * centroids and PQ codebooks). Encode and scoring are map-only over the
  * corpus with the parameters riding as literals; top-k is
  * `orderBy.limit` → TakeOrdered.
  */
object Quantize {

  /** Per-dimension calibration `(dim, min_val, max_val)` — dim is
    * 0-based. One scan, d rows out.
    */
  def quantizationParams(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(min(col("x").cast("double")).as("min_val"),
        max(col("x").cast("double")).as("max_val"))

  /** The shared encode expression: `clamp(floor((x − mn)·(255/(mx − mn)) +
    * 0.5), 0, 255) − 128`, with degenerate dimensions (mx = mn) pinned to
    * code −128. Every operation is IEEE-correctly-rounded, so the codes
    * are bit-identical in any engine that mirrors the expression order.
    */
  private def codeExpr(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      least(lit(255.0), greatest(lit(0.0),
        floor((x.cast("double") - mn) * (lit(255.0) / (mx - mn)) + lit(0.5))))
        .cast("long")) - lit(128L)

  /** Encode driver-side with the same arithmetic (for query vectors —
    * the JVM's IEEE ops match the column expression bit-for-bit).
    */
  private[graft] def encodeLocal(
      v: Seq[Double], params: Seq[(Double, Double)]): Seq[Long] =
    v.zip(params).map { case (x, (mn, mx)) =>
      (if (mx == mn) 0L
       else math.min(255.0, math.max(0.0,
         math.floor((x - mn) * (255.0 / (mx - mn)) + 0.5))).toLong) - 128L
    }

  /** The codes column for `vec` under `params` — usable in any projection
    * (map-only; the parameters ride as literal arrays).
    */
  def codesCol(vec: Column, params: Seq[(Double, Double)]): Column = {
    val mins = array(params.map(p => lit(p._1)): _*)
    val maxs = array(params.map(p => lit(p._2)): _*)
    transform(arrays_zip(vec.as("x"), mins.as("mn"), maxs.as("mx")),
      s => codeExpr(s.getField("x"), s.getField("mn"), s.getField("mx")))
  }

  /** Corpus encode: `(idCol, codes array<long>)` — map-only; `params` is
    * the collected d-row calibration (index = dim).
    */
  def scalarQuantize(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      params: Seq[(Double, Double)]): DataFrame =
    emb.select(col(idCol), codesCol(col(vecCol), params).as("codes"))

  /** Fold a delta day into an existing calibration: per-dimension min/max
    * are mergeable (min of mins, max of maxes), so the refresh is one
    * d-row union + re-aggregate — the base corpus is never re-scanned.
    */
  def refreshParams(base: DataFrame, deltaEmb: DataFrame, vecCol: String): DataFrame =
    base.unionByName(quantizationParams(deltaEmb, vecCol))
      .groupBy("dim")
      .agg(min("min_val").as("min_val"), max("max_val").as("max_val"))

  /** Calibration-drift report — THE production question for an int8
    * index: scalar-quantization codes are valid only under the
    * calibration that produced them, and a delta day that extends a
    * dimension's min/max silently shifts every existing code on that
    * dimension. Returns per-dimension `(dim, old_min, old_max, new_min,
    * new_max, drifted)` (drifted = 1 iff the range moved): drifted = 0
    * everywhere means the standing corpus's codes stay valid and the
    * delta is encode-and-append; any drifted dimension requires a
    * re-encode of that dimension's codes (map-only, but a full-corpus
    * touch — which is why the report exists).
    *
    * Raw min/max comparisons only — no arithmetic — so the report is
    * bit-exact across engines by construction. One delta scan + one
    * d-row join: the merged range is derived with least/greatest on the
    * joined rows (identical to [[refreshParams]]' union-and-reaggregate),
    * so the base-params lineage is referenced ONCE — routing through
    * refreshParams would embed it twice and re-run an unmaterialized
    * base-corpus aggregation per report.
    */
  def calibrationDrift(
      baseParams: DataFrame, deltaEmb: DataFrame, vecCol: String): DataFrame =
    baseParams
      .select(col("dim"), col("min_val").as("old_min"), col("max_val").as("old_max"))
      // left join: a dimension the delta never touches (e.g. an empty
      // delta day) still reports, un-drifted
      .join(quantizationParams(deltaEmb, vecCol), Seq("dim"), "left")
      .select(col("dim"), col("old_min"), col("old_max"),
        least(col("old_min"), coalesce(col("min_val"), col("old_min"))).as("new_min"),
        greatest(col("old_max"), coalesce(col("max_val"), col("old_max"))).as("new_max"))
      .select(col("dim"), col("old_min"), col("old_max"), col("new_min"), col("new_max"),
        when(col("new_min") < col("old_min") || col("new_max") > col("old_max"), 1L)
          .otherwise(0L).as("drifted"))

  /** Collect the calibration table into the parameter vector (d rows of
    * driver state). */
  def collectParams(emb: DataFrame, vecCol: String): Seq[(Double, Double)] =
    quantizationParams(emb, vecCol)
      .orderBy(col("dim")).collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  /** Binary (1-bit) sign quantization: bit `i` of the signature is set iff
    * component `i` is STRICTLY positive — a comparison, no arithmetic, so
    * the packing is bit-exact across engines by construction. Components
    * pack 32 per BIGINT word (`ceil(d/32)` words), 32 rather than 64 so
    * no bit ever lands on the BIGINT sign position, whose shift/overflow
    * behavior engines do not agree on.
    *
    * This is the bottom tier of the quantization ladder (float32 → int8
    * [[scalarQuantize]] → 1-bit): 32× smaller than float32, and the
    * coarse ranking degrades to XOR + popcount — the cheapest distance a
    * vector index can run, which is why binary signatures are the standing
    * in-memory tier of a disk-resident 100 TB index (the full vectors and
    * even the int8 codes stay on disk; only `ceil(d/32)` longs per vector
    * need RAM).
    */
  def signBitsCol(vec: Column, dims: Int): Column = {
    val nWords = (dims + 31) / 32
    array((0 until nWords).map { w =>
      val lo = w * 32
      // distinct powers of two — the sum IS the bitwise OR, kept as `+`
      // so the whole word stays one codegen'd arithmetic chain
      (lo until math.min(lo + 32, dims)).map { i =>
        when(element_at(vec, i + 1).cast("double") > lit(0.0),
          lit(1L << (i - lo))).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Driver-side twin of [[signBitsCol]] for query vectors. */
  private[graft] def signBitsLocal(v: Seq[Double], dims: Int): Seq[Long] = {
    val nWords = (dims + 31) / 32
    (0 until nWords).map { w =>
      val lo = w * 32
      (lo until math.min(lo + 32, dims)).foldLeft(0L) { (acc, i) =>
        if (v(i) > 0.0) acc + (1L << (i - lo)) else acc
      }
    }
  }

  /** Hamming distance between two packed signatures: per-word XOR +
    * popcount, summed — integer arithmetic, exact and order-free.
    */
  def hammingCol(a: Column, b: Column, nWords: Int): Column =
    (0 until nWords).map { w =>
      bit_count(element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1))).cast("long")
    }.reduce(_ + _)

  /** Binary-coarse top-k: rank the corpus by Hamming distance of the sign
    * signatures (ascending, ties by id), keep `coarseK` candidates with
    * their float vectors riding THROUGH the TakeOrdered (the Matryoshka
    * precedent — the exact stage never rejoins the corpus), then re-rank
    * the candidates by exact cosine. Returns `(b_rank, idCol, hamming,
    * cosine_sim)`.
    *
    * Stage 1 touches `ceil(d/32)` longs per vector — with a materialized
    * signature column that is the ENTIRE scan payload; stage 2 reads
    * `coarseK` full vectors. Both ranking stages are `orderBy.limit` →
    * TakeOrdered, never a global sort.
    */
  def binaryTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      coarseK: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val dims = query.length
    val nWords = (dims + 31) / 32
    val qWords = array(signBitsLocal(query, dims).map(lit): _*)
    val qVec = array(query.map(lit): _*)
    val base = excludeId.map(e => emb.where(col(idCol) =!= e)).getOrElse(emb)
    base
      .select(col(idCol), col(vecCol),
        hammingCol(signBitsCol(col(vecCol), dims), qWords, nWords).as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(coarseK)
      .select(col(idCol), col("hamming"),
        cosineFast(col(vecCol), qVec).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine_sim").desc, col(idCol))).cast("long").as("b_rank"),
        col(idCol), col("hamming"), col("cosine_sim"))
  }

  /** Quantized top-k: encode corpus and query under the same calibration,
    * score by the EXACT integer dot product of the int8 codes, then fetch
    * the certified float cosine for the k PICKED vectors only — the
    * two-stage shape of a memory-bound retriever. Returns `(q_rank,
    * idCol, qscore, cosine_sim)`; integer scores make the coarse ranking
    * trivially engine-portable; ties break by ascending id.
    *
    * Stage 1 touches codes only (with a materialized `codes` column the
    * scan never reads the float vectors — the 4× I/O cut is the point of
    * int8); stage 2 joins the k winners back for exact cosines — a
    * k-row broadcast join, never a second full-width pass.
    */
  def quantizedTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      params: Seq[(Double, Double)],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val qCodes = encodeLocal(query, params)
    val qLit = array(qCodes.map(lit): _*)
    val qVec = array(query.map(lit): _*)
    val base = excludeId.map(e => emb.where(col(idCol) =!= e)).getOrElse(emb)
    // quantizedDotFast = the native codegen kernel (bit-identical to the
    // HOF fold — integer arithmetic, parity-tested) keeping the corpus
    // scan inside WholeStageCodegen
    val picked = base
      .select(col(idCol),
        graft.functions.QuantizedDot.quantizedDotFast(
          codesCol(col(vecCol), params), qLit).as("qscore"))
      .orderBy(col("qscore").desc, col(idCol))
      .limit(k)
    // rank the k winners BEFORE the fetch-back join: the global window then
    // provably runs over the k-row limit output (plan-audited), not over a
    // joined frame whose bound only follows from the unique-key argument
    val ranked = picked
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("qscore").desc, col(idCol))).cast("long").as("q_rank"),
        col(idCol), col("qscore"))
    broadcast(ranked)
      .join(base.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(
        col("q_rank"), col(idCol), col("qscore"),
        cosineFast(col(vecCol), qVec).as("cosine_sim"))
      .orderBy(col("q_rank"))
  }
}
