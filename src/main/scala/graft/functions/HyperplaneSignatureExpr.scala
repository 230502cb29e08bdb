package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature: `nPlanes` sign bits of the
  * projections onto pseudo-random ±1 hyperplanes, packed into a Long.
  *
  * Bit-identical to [[VectorFunctions.hyperplaneSignature]]: plane component
  * (p, i) is +1 when [[Sha60]] of the string "p:i" is even, −1 otherwise —
  * a deterministic constant matrix both Spark and a DuckDB SQL oracle derive
  * identically (no RNG state, no engine-private hash). Each projection is a
  * sequential left fold starting at 0.0. The HOF version runs `nPlanes`
  * interpreted aggregate passes per row; this computes all projections in
  * one primitive loop over the vector, with the sign matrix materialized
  * once per (nPlanes, dim) rather than re-hashed per row.
  */
case class HyperplaneSignatureExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression with CodegenFallback {

  // Sign matrix cache keyed by vector dimensionality: planes are constants,
  // so hash work is O(nPlanes·d) once, not per row.
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def signsFor(d: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(
      d,
      _ =>
        Array.tabulate(nPlanes) { p =>
          Array.tabulate(d) { i =>
            if (Sha60.hashString(s"$p:$i") % 2 == 0) 1.0 else -1.0
          }
        })

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float|double>, got ${t.catalogString}")
    }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val signs = signsFor(n)
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

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatureExpr =
    copy(child = newChild)
}

object HyperplaneSignatureExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_signature",
      exprs => HyperplaneSignatureExpr(
        exprs.head, exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")

  def hyperplaneFast(vec: Column, nPlanes: Int): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "hyperplane_signature", vec, org.apache.spark.sql.functions.lit(nPlanes))
  }
}
