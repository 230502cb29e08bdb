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

  test("key skew profile reports exact counts, median, and ratio") {
    // key 1 → 6 rows, key 2 → 3, key 3 → 1: median per-key count = 3
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val rows = Skew.keySkewProfile(df, "k", topN = 2)
      .select("k", "key_count", "n_keys", "total_rows", "median_count", "skew_ratio")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(rows == Seq(
      (1L, 6L, 3L, 10L, 3.0, 2.0),
      (2L, 3L, 3L, 10L, 3.0, 1.0)))
  }

  test("key skew profile is invariant to input partitioning") {
    val data = (1 to 500).map(i => (i.toLong % 17, i))
    val a = Skew.keySkewProfile(data.toDF("k", "v").repartition(1), "k", 5)
      .collect().map(_.toSeq).toSeq
    val b = Skew.keySkewProfile(data.toDF("k", "v").repartition(7), "k", 5)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  private val RowOrd: Ordering[Seq[Any]] = Ordering.by(_.mkString("|"))
}
