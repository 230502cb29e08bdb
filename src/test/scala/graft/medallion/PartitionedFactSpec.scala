package graft.medallion

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedFactSpec extends SparkSpec {
  import spark.implicits._

  private def fact() = Seq(
    (1, "2013-01-05", 10.0),
    (2, "2013-01-20", 20.0),
    (3, "2013-02-11", 30.0),
    (4, "2013-02-28", 40.0),
    (5, "2014-03-01", 50.0)
  ).toDF("id", "d", "amount").withColumn("d", to_date($"d"))

  test("month granularity lays out year/month directories and prunes both levels") {
    val path = Files.createTempDirectory("pf-month").toString
    PartitionedFact.overwrite(fact(), "d", "order", PartitionedFact.Month, path)

    assert(Files.exists(Paths.get(path, "order_year=2013", "order_month=2")))
    val pruned = spark.read.parquet(path)
      .where($"order_year" === 2013 && $"order_month" === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_month"),
      s"expected month-level partition pruning in:\n$plan")
    // the pruned scan lists only the 2013-02 partition's files
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length == 1, s"expected 1 surviving partition, got ${selected.length}")
    assert(selected.head.files.forall(
      _.getPath.toString.contains("order_year=2013/order_month=2")))
    assert(pruned.count() == 2)
  }

  test("day granularity derives all three partition levels") {
    val path = Files.createTempDirectory("pf-day").toString
    PartitionedFact.overwrite(fact(), "d", "order", PartitionedFact.Day, path)
    assert(Files.exists(Paths.get(path, "order_year=2014", "order_month=3", "order_day=1")))
  }

  test("mergeDelta upserts within touched partitions, leaves others untouched, idempotent") {
    val path = Files.createTempDirectory("pf-merge").toString
    PartitionedFact.overwrite(fact(), "d", "order", PartitionedFact.Month, path)

    def untouchedFiles() = {
      val dir = Paths.get(path, "order_year=2014", "order_month=3")
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .map(p => (p.toString, Files.getLastModifiedTime(p))).toSeq.sortBy(_._1)
    }
    val before = untouchedFiles()

    // delta: update id=3, insert id=6 — both land in 2013-02
    val delta = Seq((3, "2013-02-11", 99.0), (6, "2013-02-14", 60.0))
      .toDF("id", "d", "amount").withColumn("d", to_date($"d"))
    PartitionedFact.mergeDelta(spark, path, delta, Seq("id"), "d", "order", PartitionedFact.Month)

    val merged = spark.read.parquet(path)
    assert(merged.count() == 6)
    assert(merged.where($"id" === 3).select("amount").as[Double].head() == 99.0)
    assert(merged.where($"id" === 6).count() == 1)
    val mergedRows = merged.orderBy("id").collect().toSeq
    // partitions the delta never touched keep their exact files
    assert(untouchedFiles() == before, "untouched partition was rewritten")

    // re-applying the same delta reproduces the same table state
    PartitionedFact.mergeDelta(spark, path, delta, Seq("id"), "d", "order", PartitionedFact.Month)
    val again = spark.read.parquet(path)
    assert(again.count() == 6)
    assert(again.orderBy("id").collect().toSeq == mergedRows)
  }

  test("mergeDelta preserves previously stored null-dated rows (null partition survivors)") {
    // regression: the affected-partition filter once used === instead of <=>,
    // so a delta touching the null (__HIVE_DEFAULT_PARTITION__) partition read
    // zero survivors from it while dynamic overwrite still rewrote it —
    // silently dropping every previously stored null-dated row
    val path = Files.createTempDirectory("pf-nullpart").toString
    val base = Seq((1, Some("2013-01-05"), 10.0), (2, None, 20.0), (3, None, 30.0))
      .toDF("id", "d", "amount").withColumn("d", to_date($"d"))
    PartitionedFact.overwrite(base, "d", "order", PartitionedFact.Month, path)

    // delta lands entirely in the null partition: update id=3, insert id=4
    val delta = Seq((3, Option.empty[String], 99.0), (4, Option.empty[String], 40.0))
      .toDF("id", "d", "amount").withColumn("d", to_date($"d"))
    PartitionedFact.mergeDelta(spark, path, delta, Seq("id"), "d", "order", PartitionedFact.Month)

    val merged = spark.read.parquet(path)
    assert(merged.count() == 4, "null-partition survivor id=2 must not be dropped")
    val amounts = merged.select($"id", $"amount").as[(Int, Double)].collect().toMap
    assert(amounts == Map(1 -> 10.0, 2 -> 20.0, 3 -> 99.0, 4 -> 40.0))
  }

  test("mergeDelta bootstraps an empty table from the delta") {
    val path = Files.createTempDirectory("pf-boot").toString + "/fact"
    val delta = fact()
    PartitionedFact.mergeDelta(spark, path, delta, Seq("id"), "d", "order", PartitionedFact.Month)
    assert(spark.read.parquet(path).count() == 5)
  }
}
