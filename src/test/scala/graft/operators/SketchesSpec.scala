package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("CMS: estimate >= truth for every probed token (one-sided error)") {
    val rep = Sketches.cmsTokenFrequency(docs, "text", depth = 4, width = 16, topK = 50)
      .collect()
    assert(rep.nonEmpty)
    assert(rep.forall(r => r.getAs[Long]("cms_estimate") >= r.getAs[Long]("true_count")),
      "a count-min estimate can only overestimate")
    // width 16 over a ~31-token vocabulary forces live collisions: the
    // report must witness at least one inflated row AND at least one exact
    // row, or the min-over-rows is vacuous
    assert(rep.exists(r => r.getAs[Long]("cms_estimate") > r.getAs[Long]("true_count")))
    assert(rep.exists(r => r.getAs[Long]("cms_estimate") === r.getAs[Long]("true_count")))
  }

  test("CMS is a linear sketch: shard sketches merge by element-wise sum") {
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val whole = Sketches.countMinSketch(docs, "text", depth = 4, width = 16)
    val merged = Sketches.countMinSketch(a, "text", depth = 4, width = 16)
      .unionByName(Sketches.countMinSketch(b, "text", depth = 4, width = 16))
      .groupBy("row_id", "bucket").agg(sum("counter").as("counter"))
    val diff = whole.unionByName(
        merged.select(col("row_id"), col("bucket"), (-col("counter")).as("counter")))
      .groupBy("row_id", "bucket").agg(sum("counter").as("d"))
      .where(col("d") =!= 0)
    assert(diff.count() == 0, "sum of shard sketches must equal the whole-corpus sketch")
  }

  test("CMS: absent token with untouched buckets estimates zero") {
    val tiny = Seq("alpha beta").toDF("text")
    // width large enough that a disjoint probe token misses every counter
    val sketch = Sketches.countMinSketch(tiny, "text", depth = 4, width = 4096)
    val est = Sketches.cmsEstimates(sketch, Seq("gammagamma").toDF("token"),
      depth = 4, width = 4096).collect()
    assert(est.length == 1 && est(0).getLong(1) == 0L,
      s"absent counter rows are zero counters: ${est.toList}")
  }

  test("CMS grid is bounded: at most depth*width counter rows, keys in range") {
    val sk = Sketches.countMinSketch(docs, "text", depth = 4, width = 16).collect()
    assert(sk.length <= 4 * 16)
    assert(sk.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    assert(sk.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 16L))
  }

  private def hllValues(key: String, vs: Seq[String]) = {
    import spark.implicits._
    vs.map(v => (key, v)).toDF("k", "v")
  }

  test("HLL registers: exactly keys*m rows, ranks in range, duplicates are free") {
    val regs = Sketches.hllRegisters(
      hllValues("a", (1 to 200).map("v" + _)).unionByName(hllValues("b", Seq("x"))),
      Seq("k"), "v", m = 16)
    val rows = regs.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2 * 16, "every key carries its full bucket spine")
    assert(rows.forall { case (_, b, reg) => b >= 0 && b < 16 && reg >= 0 && reg <= 57 })
    assert(rows.count { case (k, _, reg) => k == "b" && reg > 0 } == 1,
      "a single value sets exactly one register")
    val doubled = Sketches.hllRegisters(
      hllValues("a", (1 to 200).map("v" + _) ++ (1 to 200).map("v" + _)),
      Seq("k"), "v", m = 16).where($"k" === "a")
    assert(doubled.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      rows.filter(_._1 == "a").map(t => (t._2, t._3)).toSet,
      "registers depend on the distinct set only")
  }

  test("HLL merge: shard-merge == whole-corpus build; idempotent") {
    val all = (1 to 300).map("item" + _)
    val (left, right) = all.splitAt(157)
    val whole = Sketches.hllRegisters(hllValues("k", all), Seq("k"), "v", m = 32)
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(hllValues("k", left), Seq("k"), "v", m = 32),
      Sketches.hllRegisters(hllValues("k", right), Seq("k"), "v", m = 32), Seq("k"))
    def s(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(s(merged) == s(whole), "register-wise max over shards is exact")
    assert(s(Sketches.hllMerge(whole, whole, Seq("k"))) == s(whole), "idempotent replay")
  }

  test("HLL estimate lands within the error band; n_zero counts empty registers") {
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(hllValues("k", (1 to 1000).map("u" + _)), Seq("k"), "v", m = 64),
      Seq("k"), m = 64).collect().head
    val e = est.getDouble(1)
    assert(e > 600 && e < 1400, s"1000 distinct items must estimate near 1000, got $e")
    // m=4: one value fills one bucket, three registers stay zero
    val tiny = Sketches.hllEstimate(
      Sketches.hllRegisters(hllValues("k", Seq("only")), Seq("k"), "v", m = 4),
      Seq("k"), m = 4).collect().head
    assert(tiny.getLong(2) == 3L)
  }
}
