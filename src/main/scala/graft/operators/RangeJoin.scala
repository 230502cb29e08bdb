package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join — match points to the intervals containing them
  * (`lo <= v < hi`). Spark plans a raw range predicate as a broadcast
  * nested loop (or cartesian) because there is no equality key; the standard
  * scale technique is to quantize the value domain into fixed-width chunks:
  * each interval replicates to the chunks it overlaps, each point belongs to
  * exactly one chunk, and the join becomes a key-equi shuffle join on the
  * chunk id with a residual containment filter. Cost is |points| +
  * Σ(interval width / chunkWidth) rows through one shuffle — no pairwise
  * pass, and a point can never duplicate (it has one chunk).
  */
object RangeJoin {

  /** Join `points` to the `intervals` containing their `valueCol`
    * (half-open: `lo <= v < hi`). `chunkWidth` trades replication of wide
    * intervals against chunk-key fan-in; pick it near the median interval
    * width.
    */
  def intervalJoin(
      points: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      chunkWidth: Double): DataFrame = {
    require(chunkWidth > 0, "chunkWidth must be positive")
    val chunked = intervals.withColumn(
      "_chunk",
      explode(
        sequence(
          floor(col(loCol) / chunkWidth).cast("long"),
          floor(col(hiCol) / chunkWidth).cast("long"))))
    points
      .withColumn("_chunk", floor(col(valueCol) / chunkWidth).cast("long"))
      .join(chunked, Seq("_chunk"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_chunk")
  }
}
