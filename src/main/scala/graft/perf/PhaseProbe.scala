package graft.perf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the q121 composition — run manually, not part of
  * any contract (mirrors Pipeline.indexRefreshLoop stage by stage).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    import graft.queries.Pipeline
    t("q121 warm-through")(Pipeline.indexRefreshLoop(spark, dir).collect().length)
    spark.catalog.clearCache()

    // mirrored body with timers
    import graft.operators.Dedup
    import graft.streaming.DocStream
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val delta1 = d.where(col("doc_id") % 10 === 5)
    val reExact = delta1.withColumn("doc_id", -col("doc_id") * 2 - lit(1L))
    val reNear = delta1
      .withColumn("doc_id", -col("doc_id") * 2 - lit(2L))
      .withColumn("text", concat(col("text"), lit(" q121refetch")))
    val delta2 = d.where(col("doc_id") % 10 === 0)
      .unionByName(reExact).unionByName(reNear)
    val day0 = col("doc_id") >= 0 &&
      col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5
    val sigAll = t("sigAll eager")(graft.core.Caching.eager(
      Dedup.sigDocs(
        d.select(col("doc_id"), col("text"))
          .unionByName(reExact.select(col("doc_id"), col("text")))
          .unionByName(reNear.select(col("doc_id"), col("text"))),
        "doc_id", "text", shingleN = 1, numHashes = 16)))
    val sig0 = sigAll.where(day0)
    val hash0 = t("hash0 eager")(graft.core.Caching.eager(DocStream.corpusIndex(d.where(day0))))
    val st0 = t("st0 build")(DocStream.minhashIndexStateFromSigs(sig0,
      numHashes = 16, numBands = 4, shingleN = 1, maxBucketSize = 50))
    val labels0 = t("labels0 CC")(graft.core.Caching.eager(Dedup.duplicateClusters(
      Dedup.minhashNearDuplicatesFromSigs(sig0,
        numBands = 4, rowsPerBand = 4, minJaccard = 0.5))))
    val st0c = t("st0 index eager")(st0.copy(index = graft.core.Caching.eager(st0.index)))
    println("PHASE (streams skipped — measuring batch remainder with batch admit)")
    val admitted1 = t("admit1 batch-equiv")(graft.core.Caching.eager(
      DocStream.admitNearDups(
        DocStream.dedupAgainstCorpus(delta1, hash0), st0c.index, minJaccard = 0.5)))
    val sigA1 = sigAll.join(admitted1.select("doc_id"), Seq("doc_id"), "left_semi")
    val hash1 = t("hash1 fold eager")(graft.core.Caching.eager(
      DocStream.refreshCorpusIndex(hash0, admitted1)))
    val st1 = t("st1 fold")(DocStream.refreshMinhashIndexFromSigs(st0c, sigA1))
    val labels1 = t("labels1 merge")(Dedup.mergeClusters(labels0,
      Dedup.minhashNearDuplicatesFromSigs(sigA1, 4, 4, 0.5)
        .select(col("id_a"), col("id_b"))))
    val st1i = t("st1 index eager")(graft.core.Caching.eager(st1.index))
    val admitted2 = t("admit2 batch-equiv")(graft.core.Caching.eager(
      DocStream.admitNearDups(
        DocStream.dedupAgainstCorpus(delta2, hash1), st1i, minJaccard = 0.5)))
    val sigA2 = sigAll.join(admitted2.select("doc_id"), Seq("doc_id"), "left_semi")
    val labels2 = t("labels2 merge")(Dedup.mergeClusters(labels1,
      Dedup.minhashNearDuplicatesFromSigs(sigA2, 4, 4, 0.5)
        .select(col("id_a"), col("id_b"))))
    val sizes = labels2.groupBy(col("cluster_id")).agg(count(lit(1)).as("_csz"))
    t("final join+collect")(
      admitted2.select(col("doc_id"), col("source"))
        .join(labels2, Seq("doc_id"), "left")
        .join(sizes, Seq("cluster_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          coalesce(col("_csz"), lit(1L)).as("cluster_size"))
        .orderBy(col("doc_id")).collect().length)
    spark.stop()
  }
}
