package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-level contracts of the training-shard writer
  * (Curation.writeCurriculumShards) — the q131 driver oracle certifies the
  * read-back manifest against the from-scratch schedule; these pin what the
  * manifest cannot see: the boundary formula, the per-file row cap, each
  * file's internal ordering, and the plan shape (hash exchange, never a
  * global range sort).
  */
class ShardSpec extends SparkSpec {

  private def scheduled = Curation.curriculumOrder(
    graft.core.Tables(spark, Sf0001).documents, "doc_id", "text", seed = 42L)

  test("shard is the top-3-bit range bucket of the order key; non-power-of-two rejected") {
    val s = Curation.curriculumShards(scheduled, shardsPerEpoch = 8)
    assert(s.where(col("shard") =!=
      shiftright(col("order_key"), 57).cast("int")).count() == 0)
    assert(s.where(col("shard") < 0 || col("shard") > 7).count() == 0)
    intercept[IllegalArgumentException] {
      Curation.curriculumShards(scheduled, shardsPerEpoch = 6)
    }
  }

  test("shard layout plans a hash exchange and NO global range sort") {
    val plan = Curation.shardLayout(scheduled, shardsPerEpoch = 8)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("hashpartitioning"),
      "each (epoch, shard) group must be co-located by hash")
    assert(!plan.contains("rangepartitioning"),
      "the Sha60 key IS the order — a range exchange would be the global-sort funnel the design avoids")
  }

  test("written files respect the cap, are internally ordered, and reproduce the schedule exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Curation.writeCurriculumShards(scheduled, dir, shardsPerEpoch = 8,
      maxRecordsPerFile = 50)

    // every data file: at most 50 rows, order_key ascending within the file
    val files = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.map(_.toString)
          .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).toList
      } finally walk.close()
    }
    assert(files.nonEmpty)
    assert(files.exists(_.contains("shard=")), "partitionBy layout expected")
    for (f <- files) {
      val keys = spark.read.parquet(f).select("order_key")
        .collect().map(_.getLong(0))
      assert(keys.length <= 50, s"$f exceeds maxRecordsPerFile")
      assert(keys.sameElements(keys.sorted), s"$f is not internally ordered")
    }
    // cap actually binds on this fixture, or the per-file assertions are vacuous
    assert(files.size >
      spark.read.parquet(dir).select("epoch_idx", "shard").distinct().count(),
      "fixture must force at least one shard to split across files")

    // read-back == schedule, row-exactly (nothing lost, duplicated, misplaced)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("epoch_idx").cast("long").as("epoch_idx"),
        col("order_key"),
        col("shard").cast("int").as("shard"))
    assert(back.where(col("shard") =!=
      shiftright(col("order_key"), 57).cast("int")).count() == 0,
      "a row landed in a shard directory its key does not belong to")
    val sch = Curation.curriculumShards(scheduled, 8)
      .select("doc_id", "epoch_idx", "order_key", "shard")
    assert(back.count() == sch.count())
    assert(back.exceptAll(sch).count() == 0 && sch.exceptAll(back).count() == 0)
  }
}
