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

  test("pageRank: symmetric pair graph concentrates rank on the hub") {
    // star: hub 10 paired with 11..14, symmetrized
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)).toDF("a", "b")
    val sym = pairs.unionByName(pairs.select($"b".as("a"), $"a".as("b")))
    val out = Graph.pageRank(sym, "a", "b", iterations = 5)
      .orderBy($"pr_score".desc).collect()
    assert(out.head.getLong(0) == 10L, "the hub outranks every leaf")
    assert(out.tail.map(_.getLong(1)).distinct.length == 1, "leaves tie exactly")
  }
}
