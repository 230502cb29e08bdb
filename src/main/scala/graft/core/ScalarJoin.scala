package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-broadcast attachment: join one or more SINGLE-ROW aggregate frames
  * onto every row of a fact frame — the share-of-total / funnel-count shape.
  *
  * A plain `crossJoin` with a broadcast single-row side is semantically right
  * and O(n·1), but it plans as `BroadcastNestedLoopJoin`, which is exactly
  * the operator the scale audit ([[graft.core]]'s PlanAuditSpec) must forbid
  * everywhere else. Joining on a materialized constant key instead makes the
  * same O(n·1) work plan as a `BroadcastHashJoin`, so the audit can hold the
  * whole contract to "zero nested-loop joins outside the documented
  * pairwise-oracle variant" with no per-query whitelist entries for scalar
  * shapes.
  */
object ScalarJoin {

  private val Key = "_graft_scalar_k"

  /** Non-foldable constant 1. A plain `lit(1)` key does NOT work:
    * `FoldablePropagation` substitutes the literal into the join condition,
    * `1 = 1` folds to true, the equi-keys vanish, and Catalyst re-plans the
    * very `BroadcastNestedLoopJoin` this helper exists to avoid. An
    * expression rooted in `spark_partition_id()` is non-foldable (and legal
    * in a projection, unlike in a join condition), so the join keeps real
    * attribute equi-keys and plans as `BroadcastHashJoin`. Evaluates to 1
    * on every row of every partition — the value, unlike the foldability,
    * is partition-independent.
    */
  private def constKey: Column = spark_partition_id() * lit(0) + lit(1)

  /** `df` with every column of each single-row `scalars` frame attached to
    * every row. Caller contract: each scalar frame is a grouping-free
    * aggregate (exactly one row); neither side already has a [[Key]] column.
    */
  def withScalars(df: DataFrame, scalars: DataFrame*): DataFrame = {
    require(!df.columns.contains(Key), s"reserved column $Key already present")
    scalars.foldLeft(df) { (acc, s) =>
      require(!s.columns.contains(Key), s"reserved column $Key already present")
      acc.withColumn(Key, constKey)
        .join(broadcast(s.withColumn(Key, constKey)), Seq(Key))
        .drop(Key)
    }
  }
}
