package graft

import org.apache.spark.sql.functions._

/** The driver's smoke contract plus the streaming bronze-append path. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle (sha256-prefix hashing made them all SQL-expressible)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracles without queries")
  }

  test("every oracle is non-trivial SQL (a dangling entry fails here, not at gate time)") {
    val empties = SparkEntry.oracleSql.collect {
      case (name, sql) if sql == null || sql.trim.length < 20 => name
    }
    assert(empties.isEmpty, s"empty/trivial oracle SQL for: $empties")
    val noSelect = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("SELECT") => name
    }
    assert(noSelect.isEmpty, s"oracle without SELECT for: $noSelect")
  }

  test("graph tier composes with the LSH pair generator (q171/q172 shapes)") {
    import graft.queries.Pipeline
    val tri = Pipeline.lshTriangleCommunities(spark, Sf0001)
    assert(tri.where(col("n_triangles") > 0).count() > 0,
      "the densified 4-plane LSH graph must actually contain triangles")
    val comp = Pipeline.embeddingComponents(spark, Sf0001).cache()
    assert(comp.where(col("component_size") >= 3).count() > 0,
      "components must chain past direct pairs (transitivity load-bearing)")
    val notMin = comp.groupBy("component_id")
      .agg(min(col("vec_id")).as("mn"))
      .where(col("mn") =!= col("component_id")).count()
    assert(notMin == 0, "component_id is the component minimum")
    comp.unpersist()
  }

  test("madOutliers strategy flag: the approx path runs the sketch, same schema") {
    import graft.queries.Pipeline
    val exact = Pipeline.madOutliers(spark, Sf0001)
    val approx = Pipeline.madOutliers(spark, Sf0001, exactMedians = false)
    assert(approx.schema == exact.schema, "both strategies share one output contract")
    // the scale path must not plan the exact value-multiset aggregate
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile") &&
      "(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      "exactMedians=false must swap BOTH statistics to the bounded sketch")
    // q197 certifies the flag-set envelope at the contract level; here just
    // pin that the sketch path produces a sane, non-empty verdict set
    val (ne, na) = (exact.count(), approx.count())
    assert(na > 0 && math.abs(ne - na) <= math.max(5L, ne / 20),
      s"approx flag count $na should track exact $ne")
  }

  test("q217: penny rank is a total order and the result is partitioning-invariant") {
    import graft.queries.Pipeline
    // totality: the allocation grain (orderkey, linenumber) is unique after
    // the business-grain pre-aggregate, so (rem desc, linenumber) strictly
    // orders every order's lines — the sf1 lesson (duplicate line numbers
    // made the penny land nondeterministically) pinned as an invariant
    val res = Pipeline.pennyProration(spark, Sf0001)
    val rows = res.collect().toSeq
    val keys = res.select("l_orderkey", "l_linenumber").distinct().count()
    assert(keys == rows.length,
      "the allocation grain must be unique — the penny rank is total only then")
    // reconciliation: per-order pennies sum EXACTLY to the order total
    val bad = res.groupBy("l_orderkey")
      .agg(sum("alloc_cents").as("alloc"))
      .join(spark.read.parquet(s"$Sf0001/orders.parquet")
          .select(col("o_orderkey").as("l_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("target")),
        Seq("l_orderkey"))
      .where(col("alloc") =!= col("target")).count()
    assert(bad == 0, "largest-remainder allocation must reconcile to the cent")
    // determinism: the same result under a different shuffle partitioning —
    // a hash flake under the driver's partitioning can only be engine-version
    // skew, never plan nondeterminism
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val rows7 = Pipeline.pennyProration(spark, Sf0001).collect().toSeq
      assert(rows7 == rows, "q217 must be bit-identical under any partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("streaming toBronze appends micro-batches exactly once via checkpoint") {
    import graft.streaming.EventStream
    val base = java.nio.file.Files.createTempDirectory("graft-tobronze")
    val in = base.resolve("in"); java.nio.file.Files.createDirectory(in)
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      in.resolve("drop-0.parquet"))
    val q = EventStream.toBronze(EventStream.readEvents(spark, in.toString), out, ckpt)
    q.processAllAvailable()
    val n1 = spark.read.parquet(out).count()
    q.stop()
    assert(n1 == 1000, s"all sf0.001 events land once, got $n1")
    // restart from the same checkpoint: no reprocessing of the same file
    val q2 = EventStream.toBronze(EventStream.readEvents(spark, in.toString), out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(out).count() == 1000, "checkpoint prevents duplicates")
  }
}
