package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `Array[Float]`/`Array[Double]`
  * columns, built from higher-order functions (`zip_with`/`aggregate`) —
  * no UDF serialization, executes row-parallel everywhere.
  *
  * Determinism: `aggregate` is a sequential left fold per row, so the result
  * is a fixed IEEE operation sequence — bit-identical across partitionings
  * (cross-ROW double sums are order-dependent; per-row folds are not).
  */
object VectorFunctions {

  /** Elementwise dot product (operands cast to double first). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in a fixed op order: dot / (norm(a) * norm(b)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric int8 quantization of a [-1, 1]-clamped vector:
    * q_i = floor(clamp(x_i)·127 + 0.5) ∈ [-127, 127]. `floor(v + 0.5)` not
    * `round(v)`: both engines define floor identically, while round's
    * half-way tie-breaking differs across engines/types — the quantized
    * array must be bit-identical for the DuckDB oracle. Map-only, per-row;
    * 4× storage reduction for an embedding corpus at scale.
    */
  def quantizeInt8(vec: Column): Column =
    transform(
      vec,
      x =>
        floor(greatest(lit(-1.0), least(lit(1.0), x.cast("double"))) * 127.0 + 0.5)
          .cast("int"))

  /** Elementwise reconstruction error |x_i − q_i/127| of an int8-quantized
    * vector's worst dimension — per-row max (order-independent, so
    * deterministic across engines).
    */
  def maxQuantError(vec: Column, quantized: Column): Column =
    array_max(
      zip_with(
        vec,
        quantized,
        (x, q) => abs(x.cast("double") - q.cast("double") / 127.0)))

  /** Deterministic ±1 pseudo-random hyperplane component for LSH: derived
    * from [[Sha60]] of the string "plane:dim" — no RNG state, so every
    * executor (and a DuckDB SQL oracle) derives the same planes.
    */
  private def signAt(plane: Int, dim: Column): Column =
    when(
      pmod(Sha60.sha60(concat(lit(s"$plane:"), dim.cast("string"))), lit(2L)) === 0L,
      lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane (SimHash) LSH signature: `nPlanes` sign bits packed
    * into a Long. Vectors with small cosine distance collide with high
    * probability; used to bucket candidates for ANN search.
    */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column = {
    val dims = transform(vec, (_, i) => i)
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * signAt(p, i)),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
