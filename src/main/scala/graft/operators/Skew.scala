package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.ScalarJoin

/** Skew mitigation for key-equi joins. AQE's skew-join split handles most
  * cases automatically; salting is the explicit lever for the pathological
  * ones (one key holding a double-digit percentage of a 100 TB fact table,
  * where even a split partition exceeds executor memory).
  *
  * Mechanics: the large side's rows get a deterministic salt in [0, S) from
  * a content hash, spreading each hot key over S partitions; the small side
  * is replicated S× with every salt value, so the join key (keys + salt)
  * still matches exactly. Cost: S× the small side — use for dimension-sized
  * right sides only.
  */
object Skew {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // right/full outer would emit every unmatched small-side row once per
    // salt replica — saltBuckets duplicates. Only joins where the small side
    // never surfaces unmatched rows are salting-safe.
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support '$joinType': the replicated small side would " +
        "duplicate unmatched right-side rows; use inner/left/left_semi/left_anti")
    val salted = large.withColumn(
      "_salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets.toLong)).cast("int"))
    // shuffle_hash hint: salting only exists because broadcasting is off the
    // table (if the small side fit in memory you'd broadcast and skip the
    // salt entirely), so pin the shuffled-hash path rather than letting the
    // planner broadcast the S×-replicated side at test scale — the salted
    // (keys + salt) distribution is then genuinely exercised at every scale
    val expanded = small.withColumn(
      "_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
      .hint("shuffle_hash")
    salted.join(expanded, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Shuffle-key skew profile: the diagnostic you run BEFORE choosing between
    * a plain shuffle join, AQE's skew split, and [[saltedJoin]]. Returns the
    * `topN` heaviest values of `keyCol` with their row counts and each one's
    * ratio to the median per-key count — a ratio in the hundreds on a key
    * that holds percents of the table is the signal that even a split
    * partition exceeds executor memory and explicit salting is warranted.
    *
    * Shape: ONE shuffle (the per-key count aggregation, map-side combined);
    * the stats pass runs over the key-cardinality-sized counts frame and
    * attaches as a broadcast scalar ([[ScalarJoin]] — stays a hash join, not
    * a nested loop); top-N plans as `TakeOrderedAndProject`. Ties at the
    * cutoff break by key value, so the profile is deterministic. The median
    * is Spark's exact interpolated `percentile` (= DuckDB `quantile_cont`);
    * `skew_ratio` is a single IEEE division of exact inputs — both
    * engine-portable per the determinism rules in
    * [[graft.queries.Relational]].
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    // Only the KEY column's name can genuinely collide: the groupBy
    // projects every other input column away before any reserved name is
    // introduced, but a key named like an output (e.g. "key_count") would
    // duplicate a column name in the profile and ambiguate the sort.
    val reserved = Seq("key_count", "n_keys", "total_rows", "median_count", "skew_ratio")
    require(!reserved.contains(keyCol),
      s"keySkewProfile reserves '$keyCol' for its own output — rename the key column")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("key_count"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("key_count")).as("total_rows"),
      expr("percentile(key_count, 0.5)").as("median_count"))
    ScalarJoin.withScalars(counts, stats)
      .withColumn("skew_ratio", col("key_count").cast("double") / col("median_count"))
      .orderBy(col("key_count").desc, col(keyCol))
      .limit(topN)
  }
}
