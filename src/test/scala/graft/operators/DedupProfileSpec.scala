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
