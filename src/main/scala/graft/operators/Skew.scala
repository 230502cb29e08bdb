package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val expanded = small.withColumn(
      "_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(expanded, keys :+ "_salt", joinType).drop("_salt")
  }
}
