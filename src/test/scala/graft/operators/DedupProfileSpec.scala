package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions._

/** Phase timing for the MinHash pipeline at sf0.01 (diagnostic; keeps the
  * phases' row counts pinned so regressions are visible).
  */
class DedupProfileSpec extends SparkSpec {

  test("minhash at sf0.1 twice (steady-state timing)") {
    val d1 = Tables(spark, "/root/testdata/sf0.1").documents
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.minhashNearDuplicates(d1, "doc_id", "text",
        numHashes = 16, numBands = 4, shingleN = 1, minJaccard = 0.5).count()
      info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$n")
    }
    run("cold"); run("warm")
  }

  test("connected components scale smoke: 1M synthetic edges, mixed topology") {
    import spark.implicits._
    // 100k chains of 5 (diameter stress) + 500k random pairs over a 1M-node
    // id space (bulk) — far beyond any LSH output at test SF; proves the
    // union-find contraction + propagation path at volume
    val chains = spark.range(0, 500000)
      .selectExpr("(id div 5) * 10 + (id % 5) as id_a", "(id div 5) * 10 + (id % 5) + 1 as id_b")
    val random = spark.range(0, 500000)
      .selectExpr(
        "abs(xxhash64(id)) % 1000000 + 10000000 as id_a",
        "abs(xxhash64(id + 7)) % 1000000 + 10000000 as id_b")
      .where(col("id_a") =!= col("id_b"))
    val t0 = System.nanoTime()
    val clusters = Dedup.duplicateClusters(chains.union(random))
    val n = clusters.count()
    info(f"1M-edge CC: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n clustered nodes")
    // every 5-chain must fully collapse to its minimum node
    val chainCheck = clusters
      .where(col("doc_id") < 10000000L && col("doc_id") % 10 < 6)
      .withColumn("expected", (col("doc_id") - (col("doc_id") % 10)))
      .where(col("cluster_id") =!= col("expected"))
    assert(chainCheck.isEmpty, "all chain components collapse to their minimum")
    // 600k chain nodes exactly; the random family's id space collides, so
    // its distinct node count is below 1M — require the bulk arrived
    assert(n > 900000L, s"both edge families clustered, got $n")
  }

  test("minhash phases at sf0.01 complete with sane sizes") {
    val d = Tables(spark, "/root/testdata/sf0.01").documents
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      info(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val shingled = d.select(col("doc_id"),
      array_distinct(shingles(col("text"), 1)).as("shingle_set"))
    timed("shingle pass")(shingled.count())
    val sigs = shingled.select(col("doc_id"),
      Dedup.minhashSignatureOfShingles(col("shingle_set"), 16).as("sig"))
    timed("signatures")(sigs.count())
    val pairs = timed("full pipeline")(
      Dedup.minhashNearDuplicates(d, "doc_id", "text",
        numHashes = 16, numBands = 4, shingleN = 1, minJaccard = 0.5).count())
    info(s"pairs=$pairs")
    assert(pairs > 0)
  }
}
