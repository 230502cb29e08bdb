package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral (event-sequence) analytics: ordered funnels and cohort
  * retention — the product-analytics layer over the events stream that the
  * reference's cohort/window queries (`sql/common_queries.py`, cohort
  * retention and lag/lead families) gesture at but never compose into
  * multi-step user journeys.
  *
  * Both operators shuffle the fact stream ON THE USER KEY exactly once and
  * do every sequential step inside that partitioning (chained unbounded
  * window aggregates share one Exchange), so at 100 TB the work distributes
  * by user with no fact-sized re-shuffle per step.
  */
object Behavior {

  /** Ordered multi-step funnel: a user reaches step i at the EARLIEST event
    * of type `steps(i)` at-or-after their step i−1 timestamp (step 0: their
    * earliest `steps(0)` event). Emits one row per step:
    * `(step_index 1-based BIGINT, step_name, n_users BIGINT,
    * pct_of_first DOUBLE)` — the conversion share is a terminal
    * BIGINT/BIGINT division, the only float in the result.
    *
    * Scale shape: the fact stream is filtered to the step types (predicate
    * reaches the scan), shuffled ONCE by user, and each step's reach
    * timestamp is a chained unbounded `min(when(...))` window over that one
    * Exchange — step i's condition references step i−1's window column, so
    * the per-user sequential fold runs without a per-step join or re-shuffle.
    * The per-user frame then collapses to one row and the step counts are a
    * single map-side-combined aggregate; the final explode to step rows is
    * over a 1×|steps| frame.
    *
    * Steps must be distinct event types; a row can satisfy only its own
    * step's type, so `>=` (at-or-after) never lets one event count twice.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val perUser = funnelUserTimes(events, userCol, tsCol, typeCol, steps)
    val counts = perUser.select(
      steps.indices.map(i =>
        sum(when(col(s"_s$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i")): _*)
    // literal structs, not a stack() SQL string: step names are DATA (event
    // type values) and must never be spliced into parsed SQL
    val stepRows = array(steps.zipWithIndex.map { case (st, i) =>
      struct(
        lit((i + 1).toLong).as("step_index"),
        lit(st).as("step_name"),
        col(s"_n$i").as("n_users"))
    }: _*)
    counts
      .select(col("_n0"), explode(stepRows).as("_s"))
      .select(
        col("_s.step_index").as("step_index"),
        col("_s.step_name").as("step_name"),
        col("_s.n_users").as("n_users"),
        (col("_s.n_users") / col("_n0")).as("pct_of_first"))
  }

  /** The per-user step-reach frame behind [[funnel]] — one row per user
    * with columns `_s0.._s{k-1}`: the timestamp the user reached each step
    * (null = never). Exposed so downstream latency/attribution analyses
    * reuse the same reach semantics the counts certify. Same one-shuffle
    * chained-window shape.
    */
  def funnelUserTimes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct event types")
    val w = Window.partitionBy(col(userCol))
    var df = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(tsCol) >= col(s"_s${i - 1}")
      df = df.withColumn(s"_s$i", min(when(cond, col(tsCol))).over(w))
    }
    df.groupBy(col(userCol))
      .agg(
        min(col("_s0")).as("_s0"),
        steps.indices.tail.map(i => min(col(s"_s$i")).as(s"_s$i")): _*)
  }

  /** Cohort retention matrix: users are cohorted by the period of their
    * FIRST event (`floor(days since epochStart / periodDays)`), and each
    * later event marks its user active at offset
    * `activity period − cohort period`. Emits one row per populated
    * `(cohort_period, period_offset)` cell:
    * `(cohort_period BIGINT, period_offset BIGINT, n_active BIGINT,
    * cohort_size BIGINT, retention_pct DOUBLE)` — offset 0 always has
    * `n_active = cohort_size`, and the pct is a terminal BIGINT/BIGINT
    * division.
    *
    * Scale shape: the cohort period rides a per-user unbounded window min
    * on the user shuffle (not a join back to a first-event aggregate); the
    * (user, cohort, offset) dedup is one partially-aggregated exchange on
    * fact-sized input, and the cell aggregate collapses map-side-combined
    * to the matrix, which is period²-bounded — dimension-sized, never
    * fact-sized. Counting distinct users per cell is exact without
    * per-cell distinct state because the dedup runs BEFORE the cell
    * aggregate.
    */
  def retentionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      epochStart: String,
      periodDays: Int): DataFrame = {
    require(periodDays >= 1, "periodDays must be positive")
    val w = Window.partitionBy(col(userCol))
    val period = floor(
      datediff(to_date(col(tsCol)), to_date(lit(epochStart))) / periodDays)
      .cast("long")
    val marked = events
      .select(col(userCol), period.as("_p"))
      .withColumn("_cohort", min(col("_p")).over(w))
      .select(col(userCol), col("_cohort"),
        (col("_p") - col("_cohort")).as("_offset"))
      .distinct()
    val cells = marked.groupBy(col("_cohort"), col("_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.where(col("_offset") === 0)
      .select(col("_cohort"), col("n_active").as("cohort_size"))
    cells.join(sizes, Seq("_cohort"))
      .select(
        col("_cohort").as("cohort_period"),
        col("_offset").as("period_offset"),
        col("n_active"),
        col("cohort_size"),
        (col("n_active") / col("cohort_size")).as("retention_pct"))
  }

  /** Rolling `windowDays`-day DISTINCT user count per day — the rolling
    * COUNT DISTINCT Spark has no native window for, decomposed so NOTHING
    * fact-sized is ever held in window state: a user active on day `a`
    * covers days `[a, a+w−1]`; per user, overlapping coverage intervals
    * merge into islands (ascending-day `lag` split: a new island starts
    * when the gap exceeds `w−1`, so no day is covered twice by one user);
    * each island becomes a `+1` delta at its start and a `−1` after its
    * end, and the daily counts are the running sum of per-day net deltas
    * over a generated calendar.
    *
    * Scale shape: one (user, day) dedup shuffle, one per-user lag window
    * on the same key, one day-keyed delta aggregate — all fact-shuffles on
    * high-cardinality keys — and the ONLY ordered global pass runs over
    * the CALENDAR (days-since-epoch cardinality: thousands of rows for
    * years of data), built by `sequence`+`explode` from a 1-row max
    * aggregate. A windowed `approx_count_distinct` holds sketch state per
    * day; this is its exact counterpart at dimension-bounded cost.
    *
    * Emits `(day BIGINT, n_active BIGINT)` for every day 0..max active
    * day — days where no user was active in the trailing window emit 0.
    */
  def rollingDistinctUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      epochStart: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val day = datediff(to_date(col(tsCol)), to_date(lit(epochStart))).cast("long")
    val active = events.select(col(userCol).as("_u"), day.as("_d")).distinct()
    val wU = Window.partitionBy(col("_u")).orderBy(col("_d"))
    val wRun = Window.partitionBy(col("_u")).orderBy(col("_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = active
      .withColumn("_new",
        when(lag(col("_d"), 1).over(wU).isNull ||
          col("_d") - lag(col("_d"), 1).over(wU) > windowDays - 1, 1L)
          .otherwise(0L))
      .withColumn("_iid", sum(col("_new")).over(wRun))
      .groupBy(col("_u"), col("_iid"))
      .agg(
        min(col("_d")).as("_start"),
        (max(col("_d")) + (windowDays - 1)).as("_end"))
    val deltas = islands.select(col("_start").as("_day"), lit(1L).as("_delta"))
      .unionByName(islands.select((col("_end") + 1).as("_day"), lit(-1L).as("_delta")))
      .groupBy(col("_day"))
      .agg(sum(col("_delta")).as("_net"))
    // pre-epoch events would put +1 deltas on negative days the 0-based
    // calendar silently drops (leaving their -1s to drive counts NEGATIVE)
    // — fail loudly instead; the check rides the same 1-row bounds
    // aggregate the calendar needs anyway
    val calendar = active.agg(min(col("_d")).as("_mn"), max(col("_d")).as("_mx"))
      .select(explode(sequence(lit(0L),
        when(col("_mn") < 0, raise_error(concat(
          lit("rollingDistinctUsers: events predate epochStart (min day "),
          col("_mn").cast("string"), lit(")")))).otherwise(col("_mx")))).as("_day"))
    val wDay = Window.orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(deltas, Seq("_day"), "left")
      .select(col("_day"), coalesce(col("_net"), lit(0L)).as("_net"))
      .withColumn("n_active", sum(col("_net")).over(wDay))
      .select(col("_day").as("day"), col("n_active"))
  }

  /** NEW vs RETURNING daily actives: per day, how many of the day's
    * distinct users are seen for the FIRST time ever — the acquisition
    * curve every growth deck opens with. One user-keyed aggregate for the
    * first-seen day, one (day, user) distinct aggregate for activity,
    * classification is a map-side equality — no window, no self-join.
    * Returns `(day, n_active, n_new, n_returning)`, all exact BIGINTs.
    */
  def newVsReturning(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val d = to_date(col(tsCol))
    val perDay = events.select(col(userCol).as("_u"), d.as("_d")).distinct()
    val firstSeen = perDay.groupBy(col("_u")).agg(min(col("_d")).as("_first"))
    perDay.join(firstSeen, Seq("_u"))
      .groupBy(col("_d").as("day"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("_d") === col("_first"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("_d") =!= col("_first"), 1L).otherwise(0L)).as("n_returning"))
  }

  /** Sequential DEBOUNCE (throttle): per key, keep an event iff it is at
    * least `gapMicros` after the last KEPT event — the alerting/
    * notification rate-limit semantics. This is NOT a fixed-window
    * throttle: the suppression window re-anchors at each kept event, so
    * the kept set is an inherently SEQUENTIAL per-key fold no window
    * frame can express — the batch twin of the
    * [[graft.streaming.EventStream]] `flatMapGroupsWithState` shape, run
    * here through `KeyValueGroupedDataset.flatMapGroups` (the typed API's
    * per-key iterator, one shuffle on the key). Per-key memory is the
    * key's (ts, ord) pairs — events-per-key-bounded, the same envelope as
    * any per-user sessionization; the fold emits only the kept keys and
    * the full rows re-attach by semi-join, so wide payloads never pass
    * through the typed path.
    *
    * `(tsCol, ordCol)` must totally order each key's events (the usual
    * tie-break contract); equal-timestamp events keep the smaller `ordCol`
    * first, and a later event at the SAME timestamp as a kept one is
    * suppressed (distance 0 < gap).
    *
    * Contract: `keyCol`/`ordCol` must be integral (checked at plan time —
    * the typed path packs them as longs; a lossy cast would silently merge
    * or reorder keys), `tsCol` must be a timestamp, and a NULL key,
    * timestamp, or ord raises at execution (the AsOfJoin null-ts
    * discipline: a null would otherwise surface as an opaque encoder NPE
    * or merge unrelated rows under one null key).
    */
  def debounce(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    Seq(keyCol -> "key", ordCol -> "ord").foreach { case (c, role) =>
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      val t = events.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"debounce: $role column '$c' must be an integral type (got $t) — " +
          "the typed per-key fold packs it as a long")
    }
    require(
      events.schema(tsCol).dataType ==
        org.apache.spark.sql.types.TimestampType,
      s"debounce: ts column '$tsCol' must be timestamp " +
        s"(got ${events.schema(tsCol).dataType})")
    def guarded(c: String, v: Column): Column =
      when(col(c).isNull, raise_error(lit(
        s"debounce: null value in '$c' — keys, timestamps and ord values " +
          "must be non-null"))).otherwise(v)
    val spark = events.sparkSession
    import spark.implicits._
    val packed = events.select(
      guarded(keyCol, col(keyCol).cast("long")).as("_k"),
      guarded(tsCol, unix_micros(col(tsCol))).as("_t"),
      guarded(ordCol, col(ordCol).cast("long")).as("_o"))
      .as[(Long, Long, Long)]
    val kept = packed
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var lastKept = Long.MinValue
        evs.foreach { e =>
          if (lastKept == Long.MinValue || e._2 - lastKept >= gapMicros) {
            out += e
            lastKept = e._2
          }
        }
        out.iterator
      }
      .toDF("_k", "_t", "_o")
    events.join(
      kept,
      col(keyCol).cast("long") === col("_k") &&
        unix_micros(col(tsCol)) === col("_t") &&
        col(ordCol).cast("long") === col("_o"),
      "left_semi")
  }
}
