package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on heavily skewed keys") {
    // 90% of fact rows share one key — the classic hot-key shape
    val facts = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, s"f$i"))
      .toDF("k", "v")
    val dims = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "d")

    val plain = facts.join(dims, Seq("k")).collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val salted = Skew.saltedJoin(facts, dims, Seq("k"), saltBuckets = 8)
      .select("k", "v", "d").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(salted == plain)
  }

  test("left salted join preserves unmatched large-side rows") {
    val facts = Seq((1L, "a"), (99L, "orphan")).toDF("k", "v")
    val dims = Seq((1L, "d1")).toDF("k", "d")
    val out = Skew.saltedJoin(facts, dims, Seq("k"), 4, "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set((1L, "a", Some("d1")), (99L, "orphan", None)))
  }

  test("salt actually spreads the hot key across buckets") {
    val facts = (1 to 1000).map(i => (1L, s"f$i")).toDF("k", "v")
    val saltCount = facts
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .select("_salt").distinct().count()
    assert(saltCount >= 6, s"content-hash salt should hit most buckets, got $saltCount")
  }

  private val RowOrd: Ordering[Seq[Any]] = Ordering.by(_.mkString("|"))
}
