package graft.perf

import org.apache.spark.sql.SparkSession

/** Plan-shape diagnostic: execute one driver-contract query and print its
  * final (AQE-resolved) physical plan, for checking exchange reuse,
  * broadcast decisions, and pushdown without attaching a debugger.
  *
  * Usage: runMain graft.perf.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    println("=== summary ===")
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("parquet scans : " + "Scan parquet".r.findAllIn(plan).size)
    println("Exchanges     : " + "Exchange ".r.findAllIn(plan).size)
    println("Broadcasts    : " + "BroadcastHashJoin".r.findAllIn(plan).size)
    // NOTE: a parquet scan printed INSIDE an InMemoryRelation block is the
    // cache's provenance subtree, not an executed scan — cross-check the
    // two counts before reading "scans" as real I/O
    println("InMemoryScans : " + "InMemoryTableScan".r.findAllIn(plan).size)
    spark.stop()
  }
}
