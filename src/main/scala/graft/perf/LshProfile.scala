package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Sub-stage profile of the MinHash LSH pair pipeline — answers "where do
  * the executor-seconds actually go" one plan fragment at a time (shingle
  * pass, signature, banding, bucket groupBy, pair enum, jaccard verify).
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // warmup
    spark.range(0, 100000).selectExpr("sha2(cast(id as string), 256) as h")
      .agg(max("h")).collect()

    def cold[T](label: String)(body: => T): Unit = {
      spark.catalog.clearCache()
      System.gc()
      listener.settle()
      val run0 = listener.executorRunTimeMs.get
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      listener.settle()
      println(f"""{"stage":"$label","wall_sec":$wall%.3f,""" +
        f""""executor_run_sec":${(listener.executorRunTimeMs.get - run0) / 1000.0}%.3f}""")
    }

    val docs = Tables(spark, sfDir).documents
    // q65/q66's own LSH parameters — shared constants so this profile can
    // never measure a different pipeline than the one the queries run
    import graft.operators.Curation.{DefaultNumHashes => NH, DefaultNumBands => NB, DefaultShingleN => SN, DefaultMinJaccard => MJ}
    import graft.functions.TextFunctions.normalizeText
    val shingled = docs.select(
      col("doc_id"),
      split(normalizeText(col("text")), " ").as("shingle_set"))
      .where(size(col("shingle_set")) > 0)

    cold("a_read_count")(docs.count())
    cold("b_shingle_pass")(shingled.agg(sum(size(col("shingle_set")))).collect())
    cold("c_minhash_sigs") {
      shingled.select(
        graft.functions.MinHashSignatureExpr.minhashFast(col("shingle_set"), 16).as("sig"))
        .agg(max(expr("cast(sig as array<string>)"))).collect()
    }
    cold("d_full_pairs_run")(
      Dedup.minhashNearDuplicates(docs, "doc_id", "text", NH, NB, SN, MJ).count())
    cold("e_jaccard_only") {
      // candidate pairs recomputed via the public operator with an impossible
      // jaccard floor (verify still evaluates every pair's intersect/union)
      Dedup.minhashNearDuplicates(docs, "doc_id", "text", NH, NB, SN, 2.0).count()
    }

    // --- isolate which upstream stage multiplies the LSH cost in the
    // curation chain (gate → mask → exact dedup → pairs) ---
    import graft.operators.Curation
    def gated: DataFrame = Curation.qualityGate(docs, "text")
    cold("f_pairs_from_gated") {
      val g = gated.persist(); g.count()
      Dedup.minhashNearDuplicates(g, "doc_id", "text", NH, NB, SN, MJ).count()
    }
    cold("g_pairs_from_gated_masked") {
      val m = Curation.maskStage(gated, "text").persist(); m.count()
      Dedup.minhashNearDuplicates(m, "doc_id", "text", NH, NB, SN, MJ).count()
    }
    cold("h_pairs_from_exact_chain") {
      val m = Curation.maskStage(gated, "text")
      val e = Dedup.exactDedup(m, "doc_id", "text").persist(); e.count()
      Dedup.minhashNearDuplicates(e, "doc_id", "text", NH, NB, SN, MJ).count()
    }
    def warm[T](label: String)(body: => T): Unit = {
      listener.settle()
      val run0 = listener.executorRunTimeMs.get
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      listener.settle()
      println(f"""{"stage":"$label","wall_sec":$wall%.3f,""" +
        f""""executor_run_sec":${(listener.executorRunTimeMs.get - run0) / 1000.0}%.3f}""")
    }
    {
      spark.catalog.clearCache(); System.gc()
      val m = Curation.maskStage(gated, "text")
      val e = Dedup.exactDedup(m, "doc_id", "text").persist()
      warm("h1_exact_persist_materialize")(e.count())
      warm("h0_e_count_again")(e.count())
      val lsh = Dedup.minhashNearDuplicates(e, "doc_id", "text", NH, NB, SN, MJ)
      val plan = lsh.queryExecution.executedPlan.toString
      println(s"h_plan_imr_scans=${plan.sliding("InMemoryTableScan".length).count(_ == "InMemoryTableScan")}")
      println(s"h_plan_has_window=${plan.contains("Window")}")
      warm("h2_lsh_on_warm_persisted_exact")(lsh.count())
      val e4 = e.coalesce(4).persist()
      warm("h3a_coalesce4_materialize")(e4.count())
      warm("h3_lsh_on_coalesced_exact")(
        Dedup.minhashNearDuplicates(e4, "doc_id", "text", NH, NB, SN, MJ).count())
      e4.unpersist()
      e.unpersist()
    }
    spark.stop()
  }
}
