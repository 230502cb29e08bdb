package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a shingle array: `numHashes` permutation
  * minima of h_j(x) = (a_j·x + b_j) mod p, base hash [[Sha60]] (sha256-prefix,
  * DuckDB-replicable) reduced mod p = 2^31−1 — exactly the arithmetic of
  * [[graft.operators.Dedup.minhashSignatureOfShingles]], fused into one
  * primitive loop.
  *
  * Why native: the HOF formulation evaluates a `numHashes`-wide `zip_with`
  * lambda per shingle (boxing a Long per cell); cold-run profiling at sf0.1
  * showed the per-document expression work dominating the whole LSH
  * pipeline. Min is duplicate-insensitive, so callers can feed raw (non-
  * distinct) shingles.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 − 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignatureExpr(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")

  def minhashFast(shingles: Column, numHashes: Int): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "minhash_signature", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }
}
