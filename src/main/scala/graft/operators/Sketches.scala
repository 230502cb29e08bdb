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

  // ---------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007) — DETERMINISTIC cross-engine form
  // ---------------------------------------------------------------------

  /** HLL registers per key: `(keyCols…, bucket, register)` with ALL `m`
    * buckets present per key (absent = 0). Completes the sketch family:
    * MG = which items are frequent, CMS = how frequent is this item,
    * HLL = how many DISTINCT items — the three questions a corpus
    * health dashboard asks, each in O(sketch) not O(vocabulary) state.
    *
    * Determinism contract: the value hash is the engine-wide sha256
    * prefix ([[Sha60]], `"hll:" + value`), the bucket is `h mod m`, and
    * the rank is derived from the REMAINING `60−log₂m` hash bits with
    * integer/string builtins only (`length(bin(x))` is the exact
    * ⌊log₂⌋+1 — the q132 precedent; no libm) — so registers are
    * bit-identical in any engine with sha256 and a binary formatter.
    *
    * Scale shape: one scan; `max` per (key, bucket) is map-side
    * combined, so the shuffle carries at most keys·m rows whatever the
    * corpus size; final state is exactly keys·m small integers. Register
    * frames of two corpus shards merge by the same (key, bucket) `max`
    * ([[hllMerge]]) — max is idempotent/commutative, so shard-parallel
    * builds and daily refresh folds are exact, the MinHash-sketch
    * mergeability story at the cardinality tier.
    */
  def hllRegisters(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 4 && (m & (m - 1)) == 0, s"m must be a power of two >= 4, got $m")
    val bits = java.lang.Integer.numberOfTrailingZeros(m)
    val restBits = 60 - bits
    val keys = keyCols.map(col)
    val measured = df
      .select(keys :+ Sha60.sha60(concat(lit("hll:"), col(valueCol))).as("_h"): _*)
      .select(keys
        :+ pmod(col("_h"), lit(m.toLong)).as("bucket")
        :+ expr(s"_h DIV $m").as("_rest"): _*)
      .select(keys :+ col("bucket") :+ when(col("_rest") === 0L, lit(restBits + 1L))
        .otherwise(lit(restBits + 1L) - length(bin(col("_rest")))).cast("long")
        .as("_rho"): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(max(col("_rho")).as("register"))
    df.select(keys: _*).distinct()
      .select(keys :+ explode(sequence(lit(0L), lit(m - 1L))).as("bucket"): _*)
      .join(measured, keyCols :+ "bucket", "left")
      .select(keys :+ col("bucket") :+ coalesce(col("register"), lit(0L)).as("register"): _*)
  }

  /** Merge two register frames (e.g. corpus shards or a daily delta):
    * register-wise max — exact, order-free, idempotent under replay.
    */
  def hllMerge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max("register").as("register"))

  /** The RAW HLL estimate per key: `(keyCols…, hll_estimate, n_zero)`.
    *
    * `α_m · m² / Σ_j 2^(−M_j)`, with each term the exact dyadic
    * `1.0 / (1 << M_j)` and the sum folded in ascending-bucket order
    * (sort_array → sequential `aggregate`) so the float addition order is
    * pinned for the cross-engine contract. Deliberately NOT applied: the
    * small-range linear-counting correction (`m·ln(m/V)`) — `ln` is
    * libm and not bit-stable across engines (the BM25 idf precedent);
    * `n_zero` is emitted so a consumer can apply it knowing the regime.
    */
  def hllEstimate(
      registers: DataFrame,
      keyCols: Seq[String],
      m: Int = 64): DataFrame = {
    val keys = keyCols.map(col)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers
      .select(keys :+ col("bucket") :+ col("register")
        :+ (lit(1.0) /
            expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(register AS INT)) AS DOUBLE)"))
          .as("_term"): _*)
      .groupBy(keys: _*)
      .agg(
        sum(when(col("register") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sort_array(collect_list(struct(col("bucket"), col("_term")))).as("_ts"))
      .select(keys
        :+ (lit(alpha) * lit((m.toLong * m).toDouble) /
            aggregate(col("_ts"), lit(0.0), (acc, s) => acc + s.getField("_term")))
          .as("hll_estimate")
        :+ col("n_zero"): _*)
  }
}
