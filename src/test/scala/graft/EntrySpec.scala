package graft

import org.apache.spark.sql.functions._

/** The driver's smoke contract plus the streaming bronze-append path. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle (sha256-prefix hashing made them all SQL-expressible)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracles without queries")
  }

  test("every oracle is non-trivial SQL (a dangling entry fails here, not at gate time)") {
    val empties = SparkEntry.oracleSql.collect {
      case (name, sql) if sql == null || sql.trim.length < 20 => name
    }
    assert(empties.isEmpty, s"empty/trivial oracle SQL for: $empties")
    val noSelect = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("SELECT") => name
    }
    assert(noSelect.isEmpty, s"oracle without SELECT for: $noSelect")
  }

  test("graph tier composes with the LSH pair generator (q171/q172 shapes)") {
    import graft.queries.Pipeline
    val tri = Pipeline.lshTriangleCommunities(spark, Sf0001)
    assert(tri.where(col("n_triangles") > 0).count() > 0,
      "the densified 4-plane LSH graph must actually contain triangles")
    val comp = Pipeline.embeddingComponents(spark, Sf0001).cache()
    assert(comp.where(col("component_size") >= 3).count() > 0,
      "components must chain past direct pairs (transitivity load-bearing)")
    val notMin = comp.groupBy("component_id")
      .agg(min(col("vec_id")).as("mn"))
      .where(col("mn") =!= col("component_id")).count()
    assert(notMin == 0, "component_id is the component minimum")
    comp.unpersist()
  }

  test("streaming toBronze appends micro-batches exactly once via checkpoint") {
    import graft.streaming.EventStream
    val base = java.nio.file.Files.createTempDirectory("graft-tobronze")
    val in = base.resolve("in"); java.nio.file.Files.createDirectory(in)
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      in.resolve("drop-0.parquet"))
    val q = EventStream.toBronze(EventStream.readEvents(spark, in.toString), out, ckpt)
    q.processAllAvailable()
    val n1 = spark.read.parquet(out).count()
    q.stop()
    assert(n1 == 1000, s"all sf0.001 events land once, got $n1")
    // restart from the same checkpoint: no reprocessing of the same file
    val q2 = EventStream.toBronze(EventStream.readEvents(spark, in.toString), out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(out).count() == 1000, "checkpoint prevents duplicates")
  }
}
