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
    assert(sev.getAs[Long]("downstream_count") == 7 && sev.getAs[String]("severity") == "HIGH")
    val narrow = (1 to 2).map(i => ("hub", s"t$i")).toDF("src", "dst")
    val sev2 = Lineage.impact(narrow, "src", "dst", Seq("hub").toDF("seed"), "seed")
      .collect().head
    assert(sev2.getAs[String]("severity") == "LOW")
  }

  test("impact extracts critical paths to gold with their depths (data_lineage.py:701-709)") {
    val row = Lineage.impact(edges, "src", "dst", seeds, "seed").collect().head
    val paths = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("critical_paths")
      .map(r => (r.getInt(0), r.getString(1)))
    assert(paths == Seq((2, "gold.k")), s"gold.k reached at depth 2, got $paths")
    assert(row.getAs[Int]("critical_count") == 1)
  }

  test("impact recommendations follow the reference rules (data_lineage.py:728-752)") {
    // diamond fixture: 2 downstream (silver.x, gold.k), 1 critical -> the two
    // CRITICAL lines, no HIGH/multiple-table lines
    val recs = Lineage.impact(edges, "src", "dst", seeds, "seed")
      .collect().head.getAs[scala.collection.Seq[String]]("recommendations")
    assert(recs == Seq(
      "CRITICAL: 1 gold layer tables affected - validate business logic",
      "Test changes in development environment with full data pipeline"))

    // wide fan-out into gold: HIGH + CRITICAL + multiple-tables lines, in rule order
    val wide = (1 to 7).map(i => ("hub", s"gold.t$i")).toDF("src", "dst")
    val recsWide = Lineage.impact(wide, "src", "dst", Seq("hub").toDF("seed"), "seed")
      .collect().head.getAs[scala.collection.Seq[String]]("recommendations")
    assert(recsWide == Seq(
      "HIGH IMPACT: Coordinate with downstream teams before making changes",
      "Consider implementing change in phases with rollback plan",
      "CRITICAL: 7 gold layer tables affected - validate business logic",
      "Test changes in development environment with full data pipeline",
      "Multiple tables affected - consider batching notifications",
      "Update data lineage documentation after changes"))

    // no downstream rules fire -> the LOW IMPACT fallback line
    val narrow = Seq(("hub", "t1")).toDF("src", "dst")
    val recsNarrow = Lineage.impact(narrow, "src", "dst", Seq("hub").toDF("seed"), "seed")
      .collect().head.getAs[scala.collection.Seq[String]]("recommendations")
    assert(recsNarrow == Seq("LOW IMPACT: Standard change management processes apply"))
  }
}
