package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — for every left row, the single most recent
  * right row with the same key and `rightTs <= leftTs`. The operator Spark's
  * join zoo lacks (kdb aj, DuckDB/Pandas ASOF JOIN); a naive theta-join
  * (`l.ts >= r.ts` + latest-wins dedup) explodes to one row per earlier
  * right match before collapsing, which is quadratic per key.
  *
  * Formulation here is the scale-correct one: tag both sides, union, and run
  * one `last(_, ignoreNulls)` window per key ordered by (ts, side) — right
  * rows sort before left rows at equal timestamps, so the match is
  * inclusive. One shuffle on the key, no row explosion, cost O((|L|+|R|)
  * log) per key partition. Skew follows key activity like any keyed window.
  *
  * Right-side rows that share (key, ts) are ambiguous unless `rightOrdCols`
  * pins them: among equal-timestamp right rows the one GREATEST under
  * `rightOrdCols` ascending wins (it sorts last, and `last(_, ignoreNulls)`
  * reads the running latest). With no tie-break, pre-dedup the right side
  * (e.g. latest event id wins) to keep the result deterministic.
  */
object AsOfJoin {

  /** Left as-of join. Returns every left column plus an `asof` struct of
    * `rightPayload` columns (null when the key has no right row at or before
    * the left timestamp).
    *
    * @param rightOrdCols right-side columns ordering equal-timestamp right
    *                     rows (ascending; the greatest wins the as-of pick)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayload: Seq[String],
      rightOrdCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("_ts", "_m", "_l", "_r", "asof") ++
      rightOrdCols.indices.map(i => s"_tb$i")
    require(
      !(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoin reserves column names ${reserved.mkString(", ")}")
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val tbTypes = rightOrdCols.map(c => right.schema(c).dataType)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as("_ts"),
        lit(1).as("_m"),
        lStruct.as("_l"),
        lit(null).cast(rType).as("_r")) ++
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"_tb$i") }: _*)
    // a right row with a null timestamp or null key can never be "at or
    // before" anything (SQL ASOF: ts >= NULL is false, NULL keys never
    // equal) — without this filter, nulls-first ordering would make a
    // null-ts right row match every left row in its key group
    val rSide = right
      .where(
        keys.map(col(_).isNotNull)
          .foldLeft(col(rightTsCol).isNotNull)(_ && _)) // keyless (global) as-of stays legal
      .select(
        keys.map(col) ++ Seq(
          col(rightTsCol).as("_ts"),
          lit(0).as("_m"),
          lit(null).cast(lType).as("_l"),
          rStruct.as("_r")) ++
        rightOrdCols.zipWithIndex.map { case (c, i) => col(c).as(s"_tb$i") }: _*)
    // tie-break AFTER (_ts, _m): among right rows at one timestamp, the
    // greatest rightOrdCols row sorts last and wins; left rows still sort
    // after every right row at their timestamp (all their _tb are null and
    // _m=1 dominates), so the inclusive-match semantics are unchanged
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts") +: col("_m") +:
        rightOrdCols.indices.map(i => col(s"_tb$i")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_m") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) :+ col("_asof").as("asof"): _*)
  }

  /** FORWARD left as-of join: each left row picks the EARLIEST right row of
    * the same key with `right.ts >= left.ts` (inclusive) — the "next event
    * after" direction [[asofJoin]]'s latest-at-or-before cannot express by
    * flipping arguments (both sides keep their own roles: every left row
    * survives, right payload rides along). Same union + per-key ordered
    * window shape and cost; the frame just looks FORWARD
    * (`currentRow .. unboundedFollowing`, `first(_, ignoreNulls)`).
    *
    * Tie rules, mirrored from the backward join: at one timestamp, left
    * rows sort BEFORE right rows (so an equal-timestamp right row IS an
    * inclusive match), and among equal-timestamp right rows the SMALLEST
    * under `rightOrdCols` ascending wins (it sorts first and
    * `first(_, ignoreNulls)` reads the next value forward). With no
    * tie-break, pre-dedup the right side for determinism.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayload: Seq[String],
      rightOrdCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("_ts", "_m", "_l", "_r", "asof") ++
      rightOrdCols.indices.map(i => s"_tb$i")
    require(
      !(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoinForward reserves column names ${reserved.mkString(", ")}")
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val tbTypes = rightOrdCols.map(c => right.schema(c).dataType)
    // left sorts BEFORE right at an equal timestamp (_m 0 < 1): the right
    // row is inside the forward frame, so >= is inclusive
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as("_ts"),
        lit(0).as("_m"),
        lStruct.as("_l"),
        lit(null).cast(rType).as("_r")) ++
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"_tb$i") }: _*)
    // null right timestamps/keys can never be "at or after" anything; and
    // nulls-last ordering would otherwise still park them harmlessly at the
    // frame end — filtered anyway to keep the two directions symmetric
    val rSide = right
      .where(col(rightTsCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTsCol).as("_ts"),
          lit(1).as("_m"),
          lit(null).cast(lType).as("_l"),
          rStruct.as("_r")) ++
        rightOrdCols.zipWithIndex.map { case (c, i) => col(c).as(s"_tb$i") }: _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_ts") +: col("_m") +:
        rightOrdCols.indices.map(i => col(s"_tb$i")): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // a left row with a NULL timestamp has no "at or after" — without the
    // guard it sorts nulls-first and the forward frame would hand it the
    // partition's EARLIEST right row as a fabricated match (the backward
    // join gets this for free: nulls-first leaves its frame empty)
    lSide.unionByName(rSide)
      .withColumn("_asof",
        when(col("_ts").isNotNull, first(col("_r"), ignoreNulls = true).over(w)))
      .where(col("_m") === 0)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) :+ col("_asof").as("asof"): _*)
  }

  /** NEAREST as-of join: each left row picks the right row of the same
    * key minimizing `|rightTs − leftTs|` — the third member of the as-of
    * family (backward = latest-at-or-before, forward =
    * earliest-at-or-after, nearest = closer of the two), the matching
    * rule sensor/metric alignment wants when neither direction is
    * privileged.
    *
    * ONE union + ONE per-key sort serves BOTH directions: the two window
    * frames (`…,current` / `current,…`) share the partition and ordering,
    * so Spark plans a single shuffle and a single sort with two frame
    * passes — never two joins. Tie rules: at equal DISTANCE the backward
    * candidate wins (deterministic, and the natural pick — it was already
    * current state at the left timestamp; an equal-timestamp right row is
    * distance 0 both ways and resolves backward). Among equal-timestamp
    * right rows the backward pick takes the GREATEST `rightOrdCols` row
    * and the forward pick the SMALLEST — each direction keeps its own
    * join's documented convention.
    *
    * Timestamps may be TIMESTAMP (distance in exact integer µs), DATE
    * (days), or a numeric column (own algebra, compared in long for
    * integrals). Returns every left column, the `asof` payload struct,
    * and `asof_side` ('backward' | 'forward', null when the key has no
    * right rows at all).
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayload: Seq[String],
      rightOrdCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types._
    val reserved = Seq("_ts", "_tn", "_m", "_l", "_r", "_cand", "asof", "asof_side") ++
      rightOrdCols.indices.map(i => s"_tb$i")
    require(
      !(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoinNearest reserves column names ${reserved.mkString(", ")}")
    val tsType = left.schema(leftTsCol).dataType
    def toNum(c: org.apache.spark.sql.Column) = tsType match {
      case TimestampType => unix_micros(c)
      case DateType => datediff(c, to_date(lit("1970-01-01"))).cast("long")
      case _: DoubleType | _: FloatType | _: DecimalType => c.cast("double")
      case _ => c.cast("long")
    }
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val tbTypes = rightOrdCols.map(c => right.schema(c).dataType)
    // right sorts BEFORE left at an equal timestamp (the backward join's
    // convention): the distance-0 match lands in the backward frame, and
    // nearest resolves distance ties backward anyway, so the forward frame
    // missing it changes nothing
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as("_ts"),
        lit(1).as("_m"),
        lStruct.as("_l"),
        lit(null).cast(rType).as("_r")) ++
        tbTypes.zipWithIndex.map { case (t, i) => lit(null).cast(t).as(s"_tb$i") }: _*)
    val rSide = right
      .where(
        keys.map(col(_).isNotNull)
          .foldLeft(col(rightTsCol).isNotNull)(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTsCol).as("_ts"),
          lit(0).as("_m"),
          lit(null).cast(lType).as("_l"),
          rStruct.as("_r")) ++
        rightOrdCols.zipWithIndex.map { case (c, i) => col(c).as(s"_tb$i") }: _*)
    val ord = col("_ts") +: col("_m") +:
      rightOrdCols.indices.map(i => col(s"_tb$i"))
    val wBack = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withCand = lSide.unionByName(rSide)
      .withColumn("_tn", toNum(col("_ts")))
      .withColumn("_cand",
        when(col("_m") === 0, struct(col("_tn").as("t"), col("_r").as("p"))))
    val lt = col("_tn")
    val back = last(col("_cand"), ignoreNulls = true).over(wBack)
    val fwd = first(col("_cand"), ignoreNulls = true).over(wFwd)
    // a NULL left timestamp has no distance to anything: null match, null
    // side (without the guard, nulls-first ordering leaves the backward
    // frame empty and the forward frame would fabricate an
    // earliest-right-row match)
    val side = when(lt.isNull, lit(null).cast("string"))
      .when(back.isNull && fwd.isNull, lit(null).cast("string"))
      .when(fwd.isNull, lit("backward"))
      .when(back.isNull, lit("forward"))
      .when(lt - back("t") <= fwd("t") - lt, lit("backward"))
      .otherwise(lit("forward"))
    withCand
      .withColumn("asof_side", side)
      .withColumn("asof",
        when(col("asof_side") === "backward", back("p"))
          .when(col("asof_side") === "forward", fwd("p")))
      .where(col("_m") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) ++
        Seq(col("asof"), col("asof_side")): _*)
  }
}
