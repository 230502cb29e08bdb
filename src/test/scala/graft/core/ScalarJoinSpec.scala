package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins ScalarJoin's planning invariant independently of the query registry:
  * the non-foldable constant key must survive optimization so the scalar
  * attachment plans as BroadcastHashJoin, never BroadcastNestedLoopJoin.
  * PlanAuditSpec would also catch a regression, but only because q25/q66
  * happen to use the shape — this holds even if those queries change.
  */
class ScalarJoinSpec extends SparkSpec {
  import spark.implicits._

  test("withScalars plans BroadcastHashJoin, never a nested-loop join") {
    val fact = spark.range(0, 1000).select($"id", ($"id" % 7).as("grp"))
    val total = fact.agg(count(lit(1)).as("n_total"), sum($"id").as("sum_total"))
    val avg7 = fact.agg(avg($"grp").as("avg_grp"))
    val out = ScalarJoin.withScalars(fact, total, avg7)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"scalar attach must plan as BroadcastHashJoin:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"scalar attach re-planned as a nested-loop join — constKey folded:\n$plan")
  }

  test("withScalars attaches every scalar to every row with correct values") {
    val fact = spark.range(0, 100).toDF("id")
    val s1 = fact.agg(count(lit(1)).as("n"))
    val s2 = fact.agg(max($"id").as("mx"))
    val rows = ScalarJoin.withScalars(fact, s1, s2).collect()
    assert(rows.length == 100)
    assert(rows.forall(r => r.getLong(1) == 100L && r.getLong(2) == 99L))
  }
}
