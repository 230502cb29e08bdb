package graft.core

import graft.{SparkEntry, SparkSpec}

/** Automated scale guard: no query in the driver contract may plan a
  * cartesian product, and none but the deliberate pairwise-oracle variant
  * may plan a nested-loop join. This is PLANS.md's core claim as a
  * regression test — a new query (or a Spark upgrade) that silently
  * introduces an O(n²) join shape fails here, not at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a cartesian product or an unintended nested-loop join") {
    // q38 is the ONLY allowed nested-loop join in the contract: the exact
    // embedding-near-dup oracle twin, a deliberate pairwise pass over a
    // FIXED-BUDGET subset (first 50 ids — constant cost at any scale
    // factor) kept as ground truth for the certified LSH path (q67).
    // The single-row scalar-broadcast shapes (q25 share-of-total, q66
    // funnel counts) attach via core.ScalarJoin's non-foldable constant
    // key, so they plan as BroadcastHashJoin and need no whitelist entry.
    val allowedNestedLoop = Set("q38_embedding_neardup")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val nestedLoop = plan.contains("BroadcastNestedLoopJoin") && !allowedNestedLoop(name)
      if (cartesian || nestedLoop)
        Some(s"$name: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
      else None
    }
    assert(offenders.isEmpty, s"quadratic join shapes found:\n${offenders.mkString("\n")}")
  }

  test("q67's bucket cap is ids-first: no window over the LSH signature") {
    // A window over `sig` would shuffle a degenerate mega-bucket's full
    // VECTORS into a single task's window buffer before the cap filter
    // drops them; the cap must come from an ids-only groupBy + semi-join.
    val plan =
      SparkEntry.queries("q67_embedding_neardup_lsh")(spark, Sf0001)
        .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q67 plans a Window over sig:\n$plan")
  }

  test("LSH bucket pipelines aggregate with BOUNDED buffers, never plain collect_list") {
    // A plain collect_list on a bucket key materializes a degenerate
    // mega-bucket's full id array in one aggregation buffer before any size
    // filter runs — the skew-OOM shape CollectLongCapped exists to prevent.
    // Guard every query that builds LSH/fingerprint buckets: their physical
    // plans must carry the capped aggregate (when they aggregate ids at all)
    // and must NOT carry collect_list.
    val bucketQueries = Seq(
      "q34_dedup_minhash_lsh", "q52_dup_clusters", "q53_dedup_corpus",
      "q64_incremental_dedup", "q65_curation_pipeline", "q66_curation_funnel",
      "q84_winnowing_neardup", "q91_incremental_winnowing", "q95_incremental_simhash")
    val offenders = bucketQueries.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      if (plan.contains("collect_list")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded collect_list in bucket pipelines: ${offenders.mkString(", ")}")
  }
}
