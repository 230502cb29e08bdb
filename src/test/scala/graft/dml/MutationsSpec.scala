package graft.dml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0)
  ).toDF("id", "name", "score")

  private def source = Seq(
    (2L, "BOB", 25.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "score")

  test("upsert: source wins on match, both sides' unmatched rows survive") {
    val out = Mutations.upsert(target, source, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "alice", 10.0), (2L, "BOB", 25.0), (3L, "carol", 30.0)))
  }

  test("upsert is idempotent") {
    val once = Mutations.upsert(target, source, Seq("id"))
    val twice = Mutations.upsert(once, source, Seq("id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("conflictSkip keeps only new keys") {
    val out = Mutations.conflictSkip(source, target, Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("merge counts classify INSERT vs UPDATE") {
    val counts = Mutations.merge(target, source, Seq("id")).counts
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("INSERT" -> 1L, "UPDATE" -> 1L))
  }

  test("softDelete flags matching rows and keeps the rest") {
    val out = Mutations.softDelete(target, col("score") > 15.0, "tester")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("batchUpdate rewrites only rows matching the predicate") {
    val out = Mutations
      .batchUpdate(target, Map("score" -> (col("score") * 2)), col("id") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 20.0, 2L -> 20.0))
  }

  test("incrementalLoad applies watermark, order, and batch cap") {
    val src = (1 to 100).map(i => (i.toLong, i % 7)).toDF("seq", "v")
    val out = Mutations
      .incrementalLoad(src, col("seq"), lit(40L), Seq(col("v")), batchSize = 10)
      .select("seq").as[Long].collect()
    assert(out.length == 10 && out.forall(_ > 40) && out.sameElements(out.sorted))
  }

  test("overwriteTable swaps atomically and is re-readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-overwrite").toString
    val path = s"$dir/t"
    Mutations.overwriteTable(spark, target, path)
    assert(spark.read.parquet(path).count() == 2)
    Mutations.overwriteTable(spark, Mutations.upsert(target, source, Seq("id")), path)
    assert(spark.read.parquet(path).count() == 3)
  }
}
