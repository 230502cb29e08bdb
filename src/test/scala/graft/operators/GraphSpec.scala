package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 1→3, 2→1; node 3 is DANGLING (appears only as a target)
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")

  test("pageRank: hand-computed one-step update with dangling redistribution") {
    // n=3, scale=1e6: tele = (15*(1000000//3))//100 = 49999; r0 = 333333
    // shares: 1→166666 (out 2), 2→333333; dangling mass 333333 → //3 = 111111
    // r'(1) = 49999 + (85*(333333+111111))//100 = 427776
    // r'(2) = r'(3) = 49999 + (85*(166666+111111))//100 = 286109
    val out = Graph.pageRank(edges, "src", "dst", iterations = 1, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((427776L, 2L)))
    assert(out(2L) == ((286109L, 1L)))
    assert(out(3L) == ((286109L, 0L)), "dangling node is ranked and keeps out_degree 0")
  }

  test("pageRank: zero iterations returns the uniform start; direction matters") {
    val uniform = Graph.pageRank(edges, "src", "dst", iterations = 0, scale = 999L)
      .collect().map(_.getLong(1)).toSet
    assert(uniform == Set(333L), "scale // n for every node")
    val fwd = Graph.pageRank(edges, "src", "dst", iterations = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = Graph.pageRank(edges, "dst", "src", iterations = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd != rev, "reversing the edges must change the centrality")
  }

  test("pageRank: partition-invariant and checkpoint-invariant (integer arithmetic)") {
    val base = Graph.pageRank(edges, "src", "dst", iterations = 4, scale = 1000000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val parts = Graph.pageRank(edges.repartition(7), "src", "dst",
      iterations = 4, scale = 1000000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(parts == base, "floor-division fixed-point must not depend on partitioning")
    val ck = Graph.pageRank(edges, "src", "dst", iterations = 4,
      scale = 1000000000000L, checkpointEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ck == base, "lineage checkpointing is a pure execution choice")
  }

  test("triangleCounts: hand-computed triangle + pendant edge + isolated pair") {
    // triangle 1-2-3; pendant 3-4; isolated pair 5-6
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val out = Graph.triangleCounts(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 2.0 / 6.0)), "degree-3 corner: 2t/(d(d-1)) = 1/3")
    assert(out(4L) == ((1L, 0L, 0.0)), "pendant has no triangle and coefficient 0")
    assert(out(5L) == ((1L, 0L, 0.0)))
    assert(out(6L) == ((1L, 0L, 0.0)))
  }

  test("triangleCounts: K4 counts each triangle once per corner; partition-invariant") {
    // K4: C(4,3) = 4 triangles, every node in exactly 3, degree 3, coefficient 1
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toDF("a", "b")
    val base = Graph.triangleCounts(k4, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(base == (1L to 4L).map(n => (n, 3L, 3L, 1.0)).toSet)
    val parts = Graph.triangleCounts(k4.repartition(5), "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(parts == base, "orientation must not depend on partitioning")
  }

  test("pageRank: symmetric pair graph concentrates rank on the hub") {
    // star: hub 10 paired with 11..14, symmetrized
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)).toDF("a", "b")
    val sym = pairs.unionByName(pairs.select($"b".as("a"), $"a".as("b")))
    val out = Graph.pageRank(sym, "a", "b", iterations = 5)
      .orderBy($"pr_score".desc).collect()
    assert(out.head.getLong(0) == 10L, "the hub outranks every leaf")
    assert(out.tail.map(_.getLong(1)).distinct.length == 1, "leaves tie exactly")
  }

  test("kCore: cascading peel — removing one leaf drags the chain below k") {
    // K4 on {1,2,3,4} plus a pendant chain 4–5, 5–6: the 2-core is exactly
    // the K4 (6 is degree-1 → peeled; then 5 drops to degree-1 → peeled;
    // 4 keeps degree 3). Two rounds of peeling are REQUIRED — a single
    // degree filter would keep node 5.
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val core = Graph.kCore(pairs, "a", "b", k = 2)
      .orderBy($"node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(core.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"2-core must be the K4 with in-core degrees 3, got ${core.toSeq}")
  }

  test("kCore: empty core and the loud non-convergence contract") {
    // a 6-cycle has uniform degree 2: its 3-core is EMPTY (one peel round
    // removes everything at once — convergence on an empty edge set)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 6L))
      .toDF("a", "b")
    assert(Graph.kCore(cycle, "a", "b", k = 3).isEmpty, "3-core of a 6-cycle is empty")
    // the K4+chain fixture needs 2 peel rounds for k=2 — maxIter=1 must
    // throw, never return a partial core silently
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    intercept[IllegalStateException] {
      Graph.kCore(pairs, "a", "b", k = 2, maxIter = 1).count()
    }
  }

  test("kCore: the canonical-pairs contract is enforced, not trusted") {
    // duplicate pairs collapse instead of double-counting degrees: with the
    // duplicated edge counted twice, node 5 would have degree 2 and the
    // triangle {3,4,5} plus the duplicate would survive a k=2 peel wrongly
    // sized; collapsed, the 2-core is exactly the triangle with degree 2
    val dup = Seq((3L, 4L), (3L, 4L), (3L, 5L), (4L, 5L), (1L, 5L))
      .toDF("a", "b")
    val core = Graph.kCore(dup, "a", "b", k = 2)
      .orderBy($"node_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(core.toSeq == Seq((3L, 2L), (4L, 2L), (5L, 2L)),
      s"duplicate pairs must collapse before degree counting, got ${core.toSeq}")
    // a self-loop (or reversed pair) raises loudly — a silent
    // double-counted degree is the failure mode the operator promises not
    // to have
    val loop = Seq((1L, 2L), (2L, 2L)).toDF("a", "b")
    val boom = intercept[Exception] {
      Graph.kCore(loop, "a", "b", k = 1).count()
    }
    assert(boom.getMessage.contains("canonical pairs"),
      s"expected the canonical-pairs guard, got: ${boom.getMessage}")
  }
}
