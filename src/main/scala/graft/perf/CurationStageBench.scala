package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Pipeline
import graft.operators.{Curation, Dedup}

/** Per-stage breakdown of the composed curation pipeline (q65) and funnel
  * (q66) — the measurement companion to PLANS.md's stage-cost claims.
  *
  * Each stage is timed as a COLD standalone action (caches cleared + GC
  * between), then the composed queries are run `reps` times cold so
  * run-to-run variance is visible next to the stage sum. The
  * [[MetricsListener]] snapshot (executor run time, GC time, shuffle bytes,
  * spill) is printed per measurement: wall-clock swings with a flat
  * executor-run-time profile indicate environment (scheduler/GC/machine)
  * noise, not plan regressions.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.perf.CurationStageBench [reps]"`
  */
object CurationStageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.file.transferTo", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // same JIT/codegen warmup as graft.Bench so stage times are comparable
    spark.range(0, 200000)
      .selectExpr("cast(id as string) || ' lorem ipsum ' || cast(id % 7 as string) as s")
      .selectExpr("md5(s) as a", "sha2(s, 256) as b",
        "size(regexp_extract_all(s, '\\\\S+', 0)) as n")
      .agg(Map("a" -> "max", "b" -> "max", "n" -> "sum")).collect()

    def cold[T](label: String)(body: => T): Unit = {
      spark.catalog.clearCache()
      System.gc()
      listener.settle()
      val run0 = listener.executorRunTimeMs.get
      val cpu0 = listener.executorCpuTimeMs.get
      val gc0 = listener.jvmGcTimeMs.get
      val sh0 = listener.shuffleReadBytes.get
      val sp0 = listener.memoryBytesSpilled.get
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      listener.settle()
      println(f"""{"stage":"$label","wall_sec":$wall%.3f,""" +
        f""""executor_run_sec":${(listener.executorRunTimeMs.get - run0) / 1000.0}%.3f,""" +
        f""""executor_cpu_sec":${(listener.executorCpuTimeMs.get - cpu0) / 1000.0}%.3f,""" +
        f""""gc_sec":${(listener.jvmGcTimeMs.get - gc0) / 1000.0}%.3f,""" +
        s""""shuffle_read_bytes":${listener.shuffleReadBytes.get - sh0},""" +
        s""""spilled_bytes":${listener.memoryBytesSpilled.get - sp0}}""")
    }

    val docs = Tables(spark, sfDir).documents

    // --- stages, each cold and standalone (persists inside operators still
    // apply within a stage, as they do inside the composed run); stage
    // definitions come from Curation itself so they cannot drift from what
    // q65/q66 run ---
    def gated: DataFrame = Curation.qualityGate(docs, "text")
    def masked: DataFrame = Curation.maskStage(gated, "text")
    def exact: DataFrame = Dedup.exactDedup(masked, "doc_id", "text")
    val (nh, nb, sn, mj) = (Curation.DefaultNumHashes, Curation.DefaultNumBands,
      Curation.DefaultShingleN, Curation.DefaultMinJaccard)

    cold("1_gate")(gated.count())
    cold("2_gate+mask")(masked.count())
    cold("3_gate+mask+exact_dedup")(exact.count())
    cold("4_lsh_pairs_from_exact") {
      val e = graft.core.Caching.eager(exact)
      Dedup.minhashNearDuplicates(e, "doc_id", "text", nh, nb, sn, mj).count()
    }
    cold("5_full_dedup_corpus") {
      val e = graft.core.Caching.eager(exact)
      val pairs = Dedup.minhashNearDuplicates(e, "doc_id", "text", nh, nb, sn, mj)
      Dedup.dedupCorpus(e, "doc_id", pairs).count()
    }

    // --- the composed queries, reps× cold each ---
    (1 to reps).foreach { i =>
      cold(s"q65_curation_pipeline_run$i")(Pipeline.curationPipeline(spark, sfDir).count())
    }
    (1 to reps).foreach { i =>
      cold(s"q66_curation_funnel_run$i")(Pipeline.curationFunnel(spark, sfDir).count())
    }
    spark.stop()
  }
}
