package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 128-bit fingerprint family (the band-saturation mitigation for the
  * 4×16-bit quarter banding): 4×32-bit bands over a (hi, lo) two-long
  * fingerprint — same pigeonhole recall guarantee (Hamming ≤ 3 ⇒ at least
  * one clean band), band values 2^16× more selective.
  */
class Fingerprint128Spec extends SparkSpec {
  import spark.implicits._

  private def fps(rows: (Long, Long, Long)*) =
    rows.toDF("id", "hi", "lo")

  test("pigeonhole recall: every pair within Hamming 3 is found, beyond-threshold pairs are not") {
    val base = 0x123456789abcdef0L
    val hiBase = 0x0f1e2d3c4b5a6978L
    val df = fps(
      (1L, hiBase, base),
      (2L, hiBase, base ^ 1L),                    // dist 1 (lo band 0)
      (3L, hiBase ^ (1L << 40), base ^ (1L << 63)), // dist 2 vs id 1, spread across words
      (4L, hiBase ^ 0xffL, base),                 // dist 8 vs id 1 — candidate via lo bands, rejected
      (5L, ~hiBase, ~base))                       // dist 128 vs id 1, no shared band
    val out = Dedup.fingerprint128NearDuplicates(df, "id", "hi", "lo", maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // pairs within 3: (1,2)=1, (1,3)=2, (2,3)=3; (2,3): dist = 1+2 = 3
    assert(out.toSet == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 3)), out.mkString(","))
  }

  test("saturation: the 64-bit path loses a capped pair the 128-bit path keeps") {
    // one planted pair + flood sharing all the pair's CLEAN 16-bit
    // quarters (the adversarial shape of the q265 fixture): with cap 4
    // the 4×16 path drops every bucket the pair shares, while the pair's
    // hi word — untouched by the flood — keeps two clean 32-bit bands
    val q0 = 0x1111L; val q2 = 0x3333L; val q3 = 0x4444L
    def lo(q1: Long) = q0 | (q1 << 16) | (q2 << 32) | (q3 << 48)
    val hiPair = 0x0102030405060708L
    val rows =
      Seq((1L, hiPair, lo(0x2222L)), (2L, hiPair, lo(0x2223L))) ++ // dist 1
        (3L to 8L).map(i => (i, i * 0x100000001L, lo(i * 0x0101L + 0x5000L)))
    val df = rows.toDF("id", "hi", "lo")
    val found64 = Dedup.fingerprintNearDuplicates(
        df.select(col("id"), col("lo").as("fp")), "id", "fp",
        maxHamming = 3, maxBucketSize = 4)
      .collect()
    assert(found64.isEmpty,
      s"saturated 64-bit path must lose the pair: ${found64.mkString(",")}")
    val found128 = Dedup.fingerprint128NearDuplicates(
        df, "id", "hi", "lo", maxHamming = 3, maxBucketSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(found128.toSet == Set((1L, 2L, 1)),
      s"128-bit path must keep exactly the planted pair: ${found128.mkString(",")}")
  }

  test("null ids and null fingerprint halves never join") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("hi", LongType, nullable = true),
      StructField("lo", LongType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 5L, 9L), Row(2L, 5L, 9L), Row(3L, null, 9L),
        Row(4L, 5L, null), Row(null, 5L, 9L)), 1),
      schema)
    val out = Dedup.fingerprint128NearDuplicates(df, "id", "hi", "lo", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)), out.mkString(","))
  }

  test("corpus index + probe equals the incremental pairs of the one-shot join") {
    val corpus = (1L to 30L)
      .map(i => (i, i * 0x9e3779b97f4a7c15L, i * 0xc2b2ae3d27d4eb4fL))
      .toDF("id", "hi", "lo")
    val delta = Seq(
      (101L, 7L * 0x9e3779b97f4a7c15L, 7L * 0xc2b2ae3d27d4eb4fL ^ 3L), // dist 2 of corpus id 7
      (102L, 0L, 0L))
      .toDF("id", "hi", "lo")
    val idx = Dedup.fingerprint128CorpusIndex(corpus, "id", "hi", "lo")
    val out = Dedup.fingerprints128AgainstIndex(idx, delta, "id", "hi", "lo", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set((101L, 7L, 2)), out.mkString(","))
  }
}
