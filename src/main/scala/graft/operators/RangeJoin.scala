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

  /** KEYED interval-OVERLAP join (Allen-style): match every left interval
    * to every right interval of the same key that overlaps it, both sides
    * HALF-OPEN `[start, end)`. A null left/right end means an open
    * (unbounded-right) interval. Emits the joined rows plus the exact
    * overlap bounds (`overlap_start`, `overlap_end` — `overlap_end` null
    * only when BOTH sides are open).
    *
    * This is interval×interval — a different operator from
    * [[intervalJoin]]'s point-in-interval — and the keyed form is the
    * scale-honest one: the join is a plain EQUI join on the key with the
    * overlap test as a residual predicate, so it shuffles once on the key
    * and never plans a nested loop (keys with few intervals each — the
    * SCD2-dimension × session-table case — cost per key is
    * |L_k|·|R_k|, both dimension-bounded). A keyless overlap join would
    * need [[intervalJoin]]'s chunking; refuse rather than silently
    * cartesian.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String): DataFrame = {
    require(keys.nonEmpty,
      "overlapJoin requires join keys — a keyless interval overlap needs chunking (see intervalJoin)")
    val overlaps =
      (col(rEnd).isNull || col(lStart) < col(rEnd)) &&
        (col(lEnd).isNull || col(rStart) < col(lEnd))
    val oStart = greatest(col(lStart), col(rStart))
    val oEnd = when(col(lEnd).isNull, col(rEnd))
      .when(col(rEnd).isNull, col(lEnd))
      .otherwise(least(col(lEnd), col(rEnd)))
    left.join(right, keys)
      .where(overlaps)
      .withColumn("overlap_start", oStart)
      .withColumn("overlap_end", oEnd)
  }
}
