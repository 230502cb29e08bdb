package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8 clamps, bounds to [-127, 127], and round-trips within half a step") {
    val df = Seq(
      (1L, Seq(0.0f, 1.0f, -1.0f, 0.5f, -0.5f, 2.5f, -3.0f, 0.004f))
    ).toDF("vec_id", "embedding")
    val out = df.select(
      VectorFunctions.quantizeInt8(col("embedding")).as("q"),
      VectorFunctions.maxQuantError(
        col("embedding"), VectorFunctions.quantizeInt8(col("embedding"))).as("err"))
      .head()
    val q = out.getSeq[Int](0)
    assert(q == Seq(0, 127, -127, 64, -63, 127, -127, 1),
      s"floor(x*127+0.5) semantics, got $q")
    assert(q.forall(v => v >= -127 && v <= 127))
    // out-of-range inputs clamp (2.5 and -3.0 dominate the error); in-range
    // dims reconstruct within half a quantization step
    assert(out.getDouble(1) >= 1.5, "clamped dims dominate max error")
    val inRange = Seq(2L -> Seq(0.25f, -0.75f, 0.99f))
      .toDF("vec_id", "embedding")
      .select(VectorFunctions.maxQuantError(
        col("embedding"), VectorFunctions.quantizeInt8(col("embedding"))))
      .as[Double].head()
    assert(inRange <= 0.5 / 127.0 + 1e-9, s"in-range error $inRange exceeds half step")
  }

  test("quantizeInt8 is deterministic and order-preserving on real embeddings") {
    val e = graft.core.Tables(spark, Sf0001).embeddings.limit(50)
    val a = e.select(col("vec_id"), VectorFunctions.quantizeInt8(col("embedding")).as("q"))
      .orderBy("vec_id").collect().map(_.toString)
    val b = e.select(col("vec_id"), VectorFunctions.quantizeInt8(col("embedding")).as("q"))
      .orderBy("vec_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
