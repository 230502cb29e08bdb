package graft.lineage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-lineage graph traversal — the Spark-native form of the reference's
  * recursive CTEs (`logs/data_lineage.py:358-584`, `sql/common_queries.py:
  * 113-193`): upstream/downstream reachability with depth numbering from 1,
  * cycle prevention via a path array, and a hard depth cap.
  *
  * Spark has no recursive CTE, so recursion is a driver-side iterative loop:
  * each step is `frontier ⋈ edges` (a keyed shuffle join). The edge table is
  * cached once; the frontier shrinks as paths exhaust. The depth cap (default
  * 5, as the reference) bounds the loop; `array_contains(path, node)`
  * reproduces the reference's `NOT (x = ANY(path))` cycle guard.
  *
  * Scale: lineage graphs are metadata-sized (≤ millions of edges), so each
  * iteration is cheap; the pattern still distributes correctly if edges are
  * huge because every step is a hash join on the node key.
  */
object Lineage {

  /** Edge schema: (src, dst) node names, plus any metadata columns. */

  /** Reachability from `seeds` following src→dst (downstream) with depth and
    * path tracking. Output: seed, node, depth (1-based), path (array of nodes
    * from seed to node inclusive).
    */
  def traverse(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst")).distinct().cache()
    var frontier = seeds
      .select(col(seedCol).as("seed"))
      .distinct()
      .withColumn("node", col("seed"))
      .withColumn("depth", lit(0))
      .withColumn("path", array(col("seed")))
    var acc = frontier.where(lit(false)) // empty, same schema
    // localCheckpoint generations are released DETERMINISTICALLY (the same
    // discipline as the connected-components loop, Dedup.scala): each
    // round's eager checkpoint pins its blocks until GC + ContextCleaner
    // get to them, so the loop otherwise holds O(depth) frontier
    // generations in storage memory for the rest of the query — pure GC /
    // storage pressure in a many-query session. The checkpointed RDD is
    // not publicly reachable from the Dataset, so track it by
    // persistent-RDD-id delta (single-threaded here; no concurrent
    // persists).
    val sc = edges.sparkSession.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint() // eager: materialized on return
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var frontierIds = Set.empty[Int]
    var accIds = Set.empty[Int]
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val next = frontier
        .join(e, frontier("node") === e("_src"))
        .where(!array_contains(col("path"), col("_dst")))
        .select(
          col("seed"),
          col("_dst").as("node"),
          // depth + 1 from the carried column, NOT lit(depth): an inlined
          // Int literal changes the generated codegen source every round,
          // so each iteration Janino-compiles (and the JVM then JITs) a
          // fresh class per stage — ~2k classes over one q27 run, pure
          // suite tax. The column form generates identical source each
          // round and hits the codegen cache from round 2 on.
          (col("depth") + 1).as("depth"),
          concat(col("path"), array(col("_dst"))).as("path"))
      // localCheckpoint truncates the growing lineage chain so the plan does
      // not deepen linearly with iterations (classic iterative-Spark pitfall).
      val (newFrontier, nfIds) = checkpointTracked(next)
      if (newFrontier.isEmpty) { release(nfIds); done = true }
      else {
        // fold the frontier into a checkpointed accumulator, then release
        // the superseded acc + frontier generations: both are fully copied
        // into newAcc's materialized blocks, so live storage is bounded at
        // ~2 generations instead of all `depth` of them
        val (newAcc, naIds) = checkpointTracked(acc.unionByName(newFrontier))
        release(accIds)
        release(frontierIds)
        acc = newAcc; accIds = naIds
        frontier = newFrontier; frontierIds = nfIds
      }
    }
    release(frontierIds) // acc holds its rows; the last frontier is superseded
    // Every kept row set is localCheckpointed (materialized), so the edge
    // cache is no longer referenced by the result — release it.
    e.unpersist()
    acc
  }

  /** Distinct reachable nodes per seed with their minimum depth (the
    * reference dedups traversal output and buckets by depth,
    * `logs/data_lineage.py:441-466`).
    */
  def reachable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int = 5): DataFrame =
    traverse(edges, srcCol, dstCol, seeds, seedCol, maxDepth)
      .groupBy(col("seed"), col("node"))
      .agg(min(col("depth")).as("depth"))

  /** Bidirectional trace (reference `sql/common_queries.py:113-193`): one
    * result with a `direction` tag, upstream and downstream from the same
    * seeds, default depth 3 as the reference's combined trace.
    */
  def bidirectionalTrace(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int = 3): DataFrame =
    reachable(edges, srcCol, dstCol, seeds, seedCol, maxDepth)
      .withColumn("direction", lit("downstream"))
      .unionByName(
        upstream(edges, srcCol, dstCol, seeds, seedCol, maxDepth)
          .withColumn("direction", lit("upstream")))

  /** Upstream = downstream over reversed edges. */
  def upstream(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int = 5): DataFrame =
    reachable(edges, dstCol, srcCol, seeds, seedCol, maxDepth)

  /** Impact analysis (reference `logs/data_lineage.py:658-752`): downstream
    * table count → severity LOW / MEDIUM (>2) / HIGH (>5), max depth affected,
    * plus the reference's two refinements:
    *
    *   - critical paths (`data_lineage.py:701-709`): the downstream nodes in
    *     the gold layer (`isCritical`, default: node name starts with
    *     "gold."), with the depth each is reached at — sorted (depth, node)
    *     structs;
    *   - rule-based recommendations (`data_lineage.py:728-752`): the exact
    *     reference rule list keyed on severity, critical-path count, and
    *     affected-table count, falling back to the LOW-IMPACT line.
    *
    * All computed in the one aggregation over the traversal — no extra pass.
    */
  def impact(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxDepth: Int = 5,
      isCritical: Column => Column = _.startsWith("gold.")): DataFrame = {
    val base = reachable(edges, srcCol, dstCol, seeds, seedCol, maxDepth)
      .where(col("node") =!= col("seed"))
      .groupBy(col("seed"))
      .agg(
        count(lit(1)).as("downstream_count"),
        max(col("depth")).as("max_depth"),
        // collect_list drops nulls, so only critical nodes land in the array
        sort_array(collect_list(when(
          isCritical(col("node")),
          struct(col("depth").as("depth"), col("node").as("target_table")))))
          .as("critical_paths"))
      .withColumn("critical_count", size(col("critical_paths")))
      .withColumn(
        "severity",
        when(col("downstream_count") > 5, "HIGH")
          .when(col("downstream_count") > 2, "MEDIUM")
          .otherwise("LOW"))
    val rules = array_compact(array(
      when(col("severity") === "HIGH",
        lit("HIGH IMPACT: Coordinate with downstream teams before making changes")),
      when(col("severity") === "HIGH",
        lit("Consider implementing change in phases with rollback plan")),
      when(col("critical_count") > 0,
        concat(lit("CRITICAL: "), col("critical_count").cast("string"),
          lit(" gold layer tables affected - validate business logic"))),
      when(col("critical_count") > 0,
        lit("Test changes in development environment with full data pipeline")),
      when(col("downstream_count") > 3,
        lit("Multiple tables affected - consider batching notifications")),
      when(col("downstream_count") > 3,
        lit("Update data lineage documentation after changes"))))
    base.withColumn(
      "recommendations",
      when(size(rules) === 0,
        array(lit("LOW IMPACT: Standard change management processes apply")))
        .otherwise(rules))
  }
}
