package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sha60

/** Count–min sketch over the token stream: a `depth × width` grid of
  * counters supporting point-frequency queries with one-sided error
  * (estimate ≥ truth, overestimate ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
  *
  * Complements the Misra–Gries heavy hitter sketch already in the engine:
  * MG answers "which items are frequent", CMS answers "how frequent is
  * THIS item" for arbitrary items, and — being a linear sketch — merges
  * across corpus shards by plain element-wise addition, which is exactly
  * what the distributed build below exploits (the grid is a `groupBy
  * (row_id, bucket)` SUM, map-side combined; sketches of two corpora
  * union by the same SUM).
  *
  * Scale shape: the corpus is scanned once and collapsed to the distinct
  * token frame first (map-side combine), so the `depth`-way hash fan-out
  * explodes VOCAB-sized rows, not corpus-sized ones; final state is
  * exactly `depth·width` counter rows regardless of corpus size. Hashes
  * are `sha60("cms:" + row + ":" + token) mod width` — the engine-wide
  * sha256-prefix base hash, so DuckDB reproduces every counter
  * bit-for-bit.
  */
object Sketches {

  /** The (row_id, bucket) counter for hash row `j` of `token`. */
  private def cmsBucket(token: Column, j: Column, width: Int): Column =
    pmod(Sha60.sha60(concat(lit("cms:"), j.cast("string"), lit(":"), token)),
      lit(width.toLong))

  /** Lower-cased `[a-z0-9]+` tokens of `textCol`, collapsed to
    * (token, cnt).
    */
  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Build the sketch: `(row_id, bucket, counter)`, `depth·width` rows
    * (absent rows are zero counters).
    */
  def countMinSketch(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame =
    tokenCounts(df, textCol)
      .select(col("cnt"), explode(transform(
        sequence(lit(0), lit(depth - 1)),
        j => struct(
          j.cast("int").as("row_id"),
          cmsBucket(col("token"), j, width).as("bucket")))).as("h"))
      .groupBy(col("h.row_id").as("row_id"), col("h.bucket").as("bucket"))
      .agg(sum("cnt").as("counter"))

  /** Point-frequency estimates for `probes` (a frame with a `token`
    * column): min over the `depth` counter rows addressed by the token's
    * hashes. A token whose buckets were never touched estimates 0 (absent
    * counter rows ARE zero). Probes broadcast against the `depth·width`-row
    * sketch.
    */
  def cmsEstimates(
      sketch: DataFrame,
      probes: DataFrame,
      depth: Int,
      width: Int): DataFrame = {
    val addressed = probes
      .select(col("token"), explode(transform(
        sequence(lit(0), lit(depth - 1)),
        j => struct(
          j.cast("int").as("row_id"),
          cmsBucket(col("token"), j, width).as("bucket")))).as("h"))
      .select(col("token"), col("h.row_id").as("row_id"), col("h.bucket").as("bucket"))
    addressed
      .join(sketch, Seq("row_id", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_estimate"))
  }

  /** Sketch-vs-truth report for the corpus's own top-`k` tokens:
    * `(token, true_count, cms_estimate)` — the estimate is provably ≥ the
    * truth; rows where they differ witness live collisions (the min over
    * rows is load-bearing, not vacuous).
    */
  def cmsTokenFrequency(
      df: DataFrame,
      textCol: String,
      depth: Int,
      width: Int,
      topK: Int): DataFrame = {
    val truth = tokenCounts(df, textCol)
    val probes = truth
      .orderBy(col("cnt").desc, col("token"))
      .limit(topK)
    val sketch = countMinSketch(df, textCol, depth, width)
    probes
      .join(cmsEstimates(sketch, probes.select("token"), depth, width), Seq("token"))
      .select(col("token"), col("cnt").as("true_count"), col("cms_estimate"))
      .orderBy(col("true_count").desc, col("token"))
  }
}
