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
}
