package graft.lineage

import graft.SparkSpec

class LineageSpec extends SparkSpec {
  import spark.implicits._

  // bronze.a → silver.x → gold.k ; bronze.b → silver.x (diamond into gold.k);
  // plus a cycle silver.x → bronze.a.
  private def edges = Seq(
    ("bronze.a", "silver.x"),
    ("bronze.b", "silver.x"),
    ("silver.x", "gold.k"),
    ("silver.x", "bronze.a") // cycle back
  ).toDF("src", "dst")

  private def seeds = Seq("bronze.a").toDF("seed")

  test("traversal terminates on cycles and reports min depth per node") {
    val out = Lineage.reachable(edges, "src", "dst", seeds, "seed", maxDepth = 5)
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap
    assert(out == Map("silver.x" -> 1, "gold.k" -> 2))
  }

  test("upstream is the reverse traversal") {
    val up = Lineage.upstream(edges, "src", "dst", Seq("gold.k").toDF("seed"), "seed")
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap
    assert(up == Map("silver.x" -> 1, "bronze.a" -> 2, "bronze.b" -> 2))
  }

  test("depth cap truncates the walk") {
    val shallow = Lineage.reachable(edges, "src", "dst", seeds, "seed", maxDepth = 1)
      .collect().map(_.getString(1)).toSet
    assert(shallow == Set("silver.x"))
  }

  test("bidirectional trace tags both directions from one seed") {
    val out = Lineage.bidirectionalTrace(
      edges, "src", "dst", Seq("silver.x").toDF("seed"), "seed")
      .collect().map(r => (r.getString(3), r.getString(1))).toSet
    assert(out.contains(("downstream", "gold.k")))
    assert(out.contains(("upstream", "bronze.a")) && out.contains(("upstream", "bronze.b")))
  }

  test("impact severity classifies by downstream count") {
    val wide = (1 to 7).map(i => ("hub", s"t$i")).toDF("src", "dst")
    val sev = Lineage.impact(wide, "src", "dst", Seq("hub").toDF("seed"), "seed")
      .collect().head
    assert(sev.getLong(1) == 7 && sev.getString(3) == "HIGH")
    val narrow = (1 to 2).map(i => ("hub", s"t$i")).toDF("src", "dst")
    val sev2 = Lineage.impact(narrow, "src", "dst", Seq("hub").toDF("seed"), "seed")
      .collect().head
    assert(sev2.getString(3) == "LOW")
  }
}
