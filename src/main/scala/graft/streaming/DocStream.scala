package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.operators.Curation

/** Streaming document curation — the ingest-time twin of the batch
  * [[graft.operators.Curation]] pipeline: documents arriving as parquet
  * drops are quality-scored, language-tagged, repetition-checked, and
  * PII-masked inside the stream.
  *
  * Every gate here is stateless per-row expression work, so the streaming
  * plan is identical to the batch plan modulo the source — no state store,
  * no watermark needed, unbounded-stream-safe by construction. (Stateful
  * streaming curation — dedup within a horizon — is [[EventStream
  * .dedupStream]]; near-dup clustering stays a batch/compaction job by
  * design: LSH banding needs the full corpus.)
  */
object DocStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based document stream from a directory of parquet drops. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Compact content-hash index of an existing corpus — the static side of
    * [[dedupAgainstCorpus]]. Hash-only: at scale this is the only corpus
    * artifact the stream needs resident.
    */
  def corpusIndex(corpus: DataFrame): DataFrame =
    corpus
      .select(md5(TextFunctions.normalizeText(col("text"))).as("content_hash"))
      .distinct()

  /** Drop stream documents whose normalized content already exists in the
    * corpus index (stream–static `left_anti` join; Spark re-plans the static
    * side per micro-batch, broadcasting while it fits). The streaming twin
    * of [[graft.operators.Dedup.exactIncrement]] — within-stream dedup is
    * [[EventStream.dedupStream]]'s watermark-bounded state instead.
    */
  def dedupAgainstCorpus(docs: DataFrame, index: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(TextFunctions.normalizeText(col("text"))))
      .join(index, Seq("content_hash"), "left_anti")
      .drop("content_hash")

  /** The curation gate: keep documents scoring at least `minQuality` that
    * are not repetition-flagged, emit them PII-masked with their scores.
    * Works identically on a streaming or batch DataFrame — the stream==batch
    * equality is the spec's gate.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val t = col("text")
    val toks = TextFunctions.tokens(t)
    val distinctRatio =
      size(array_distinct(toks)).cast("double") / size(toks).cast("double")
    docs
      .withColumn("quality_score", TextFunctions.qualityScore(t))
      .withColumn("predicted_lang", TextFunctions.langId(t))
      .where(col("quality_score") >= minQuality && distinctRatio >= 0.3)
      .select(
        col("doc_id"),
        col("source"),
        col("predicted_lang"),
        col("quality_score"),
        Curation.maskPii(t).as("text"))
  }
}
