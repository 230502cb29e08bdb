package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.audit.{LogStore, PerformanceMonitor}
import graft.catalog.WarehouseCatalog
import graft.perf.MetricsListener

/** Extension registration, listener metrics, and bucketed co-location —
  * each drives a real session and inspects real plans/metrics.
  */
class ExtensionsAndPerfSpec extends AnyFunSuite {

  // withExtensions only applies at session construction — if another suite
  // already built the shared session, stop it and build fresh
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("GraftExtensions makes cosine_similarity available in SQL at session start") {
    val v = spark
      .sql("SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(v == 1.0)
  }

  test("MetricsListener collects task metrics around a workload") {
    val store = new LogStore(
      spark, java.nio.file.Files.createTempDirectory("graft-perf").toString)
    val monitor = new PerformanceMonitor(store)
    val n = MetricsListener.measuring(spark, monitor) {
      spark.range(0, 100000).select(sum(col("id"))).head().getLong(0)
    }
    assert(n == 4999950000L)
    val recorded = store.events("performance_metrics")
      .select("metric_name", "metric_value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(recorded("tasks_completed") > 0)
    assert(recorded("jobs_completed") >= 1)
    assert(recorded.contains("shuffle_read") && recorded.contains("executor_run_time"))
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val cat = new WarehouseCatalog(spark, wh)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_silver LOCATION '$wh/silver.db'")
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "v")
    val dims = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("k", "d")
    cat.saveBucketed("silver", "facts_b", facts, Seq("k"), 4)
    cat.saveBucketed("silver", "dims_b", dims, Seq("k"), 4)
    // disable broadcast so the join strategy decision is about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_silver.facts_b")
        .join(spark.table("graft_silver.dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // k=0 facts (10 rows) have no dim row; dim k=100 has no facts → 990
      assert(joined.count() == 990)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP DATABASE graft_silver CASCADE")
    }
  }
}
