package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1-equivalent scale-smoke data generator: replicates an sf0.1
  * `documents` table `copies`× with every token suffixed by the copy index
  * and doc_ids remapped into disjoint ranges.
  *
  * The token suffix makes the copies shingle-disjoint, so the result is
  * `copies` independent sf0.1 corpora in one table: 10× the rows with the
  * SAME per-copy duplicate/skew structure — the right input for testing
  * that the dedup/curation pipelines scale linearly (replicating verbatim
  * would instead make every document a 10-way near-duplicate and shift the
  * whole workload into degenerate mega-buckets).
  *
  * Usage: `graft.ScaleSmoke <srcSfDir> <outDir> [copies=10]`, then run
  * `graft.Bench` with `SPARK_GRAFT_SF_DIR=<outDir>` and
  * `SPARK_GRAFT_BENCH_ONLY=<heavy queries>`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.local()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val idSpan = 10000000L
    val scaled = (0 until copies)
      .map { i =>
        docs.select(
          (col("doc_id") + lit(i * idSpan)).as("doc_id"),
          // suffix every token (and so every shingle) with the copy index;
          // whitespace runs are preserved so normalization behaves as in the
          // original corpus
          regexp_replace(col("text"), "(\\S+)", s"$$1·$i").as("text"),
          col("lang"),
          concat(col("source"), lit(s"_$i")).as("source"),
          col("n_chars"))
      }
      .reduce(_.unionByName(_))
    scaled
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"scale-smoke: wrote ${copies}x ${docs.count()} docs to $out")
    spark.stop()
  }
}
