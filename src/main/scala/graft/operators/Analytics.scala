package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics query patterns — the Spark-native re-expression of the
  * reference's `sql/common_queries.py` (pivot, running totals, lag/lead,
  * cohort retention, time-series gap detection).
  *
  * All combinators are pure `DataFrame => DataFrame`: Catalyst sees the whole
  * plan, so pushdown/pruning/AQE apply across combinator boundaries. Every
  * window here partitions by a caller-supplied key, so at 100 TB the work
  * distributes by key — no global windows (a global `Window.orderBy` with no
  * partition would serialize onto one task and is deliberately absent).
  */
object Analytics {

  /** Pivot table via conditional aggregation (reference
    * `sql/common_queries.py:297-341`). `pivotValues` must be supplied
    * explicitly: an open pivot triggers an extra distinct-collect job over the
    * full table, which at 100 TB is a full scan just to discover headers.
    */
  def pivotTable(
      df: DataFrame,
      rowKeys: Seq[String],
      pivotCol: String,
      pivotValues: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(rowKeys.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(agg)

  /** Running totals with optional period reset (reference
    * `sql/common_queries.py:344-396`): cumulative sum + running average over a
    * per-partition ordered frame `ROWS UNBOUNDED PRECEDING..CURRENT ROW`.
    * `resetBy` ∈ {year, quarter, month} adds the period to the partition key,
    * which *narrows* partitions — strictly better parallelism at scale.
    *
    * The running average is derived as exact-sum / row-count rather than
    * `avg().over`, so the result is deterministic under any partition order
    * (sum of DecimalType is associative; a double sum is not).
    */
  def runningTotals(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      value: Column,
      resetBy: Option[String] = None): DataFrame = {
    val dateCol = orderBy.head
    val resetCols: Seq[Column] = resetBy match {
      case Some("year")    => Seq(year(dateCol))
      case Some("quarter") => Seq(year(dateCol), quarter(dateCol))
      case Some("month")   => Seq(year(dateCol), month(dateCol))
      case None            => Nil
      case Some(other) =>
        throw new IllegalArgumentException(s"resetBy must be year|quarter|month, got $other")
    }
    val w = Window
      .partitionBy(partitionBy ++ resetCols: _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runSum = sum(value).over(w)
    val runCnt = count(lit(1)).over(w)
    // Both columns in ONE projection: chained withColumns re-alias the reset
    // expression between Projects, so the planner sees two distinct window
    // specs and emits two Window operators with an extra Exchange (and
    // computes the sum twice). A single select keeps one Window, one shuffle.
    df.select(
      col("*"),
      runSum.as("running_total"),
      (runSum.cast("double") / runCnt.cast("double")).as("running_avg"))
  }

  /** Lag/lead deltas and percent change per period offset (reference
    * `sql/common_queries.py:399-445`). Emits, for each offset n in `periods`:
    * `prev_{n}`, `next_{n}`, `delta_{n}` and `pct_change_{n}` =
    * ROUND(100*(v - prev)/prev, 2) with NULLIF(prev,0) zero-guard semantics.
    */
  def lagLead(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      value: Column,
      periods: Seq[Int] = Seq(1)): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    periods.foldLeft(df) { (acc, n) =>
      val prev = lag(value, n).over(w)
      val vd = value.cast("double")
      val pd = prev.cast("double")
      acc
        .withColumn(s"prev_$n", prev)
        .withColumn(s"next_$n", lead(value, n).over(w))
        .withColumn(s"delta_$n", value - prev)
        .withColumn(
          s"pct_change_$n",
          round(lit(100.0) * (vd - pd) / when(pd =!= 0.0, pd), 2))
    }
  }

  /** Time-series gap detection (reference `sql/common_queries.py:514-580`,
    * intended semantics per SURVEY §2.14): for each partition ordered by
    * `dateCol`, a gap is a consecutive pair more than `maxGapDays` apart.
    * Output rows: partition keys + gap_start, gap_end, gap_days.
    */
  def timeSeriesGaps(
      df: DataFrame,
      partitionBy: Seq[Column],
      dateCol: Column,
      maxGapDays: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(dateCol)
    df.withColumn("gap_start", to_date(dateCol))
      .withColumn("gap_end", lead(to_date(dateCol), 1).over(w))
      .withColumn("gap_days", datediff(col("gap_end"), col("gap_start")))
      .where(col("gap_days") > maxGapDays)
  }

  /** Cohort retention (reference `sql/common_queries.py:448-511`): cohort =
    * first activity month per entity; period index = whole months between the
    * activity month and the cohort month; count distinct entities per
    * (cohort, period), plus cohort size and retention rate.
    *
    * The cohort assignment is a window `min` (one shuffle by entity), then a
    * single aggregation by (cohort, period) — two shuffles total; at 100 TB
    * both keys are high-cardinality so neither hotspots.
    */
  def cohortRetention(
      df: DataFrame,
      entity: Column,
      eventDate: Column): DataFrame = {
    val cohortW = Window.partitionBy(entity)
    val withCohort = df
      .withColumn("cohort_month", date_trunc("month", min(eventDate).over(cohortW)))
      .withColumn("activity_month", date_trunc("month", eventDate))
      .withColumn(
        "period_number",
        floor(months_between(col("activity_month"), col("cohort_month"))).cast("int"))
    val retained = withCohort
      .groupBy(col("cohort_month"), col("period_number"))
      .agg(countDistinct(entity).as("active_entities"))
    val sizeW = Window.partitionBy(col("cohort_month"))
    retained
      .withColumn(
        "cohort_size",
        max(when(col("period_number") === 0, col("active_entities"))).over(sizeW))
      .withColumn(
        "retention_pct",
        round(lit(100.0) * col("active_entities").cast("double") /
          col("cohort_size").cast("double"), 2))
  }

  /** Dedup-latest (reference `README.md:604-610`): keep the newest row per
    * key, ordered by `orderBy` descending with deterministic tie-breaks.
    */
  def dedupLatest(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame =
    dedupOrdered(df, keys, orderBy.map(_.desc))

  /** Keep the first row per key under ascending order (e.g. minimum id). */
  def dedupFirst(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame =
    dedupOrdered(df, keys, orderBy.map(_.asc))

  /** Ordered multi-stage conversion funnel: for each entity (user), stage
    * i counts only if an event of stage i's type happens STRICTLY after
    * some qualifying stage-(i−1) event. Returns one row per stage:
    * `(stage_idx, stage, n_users, pct_of_prev)`.
    *
    * Scale shape: every stage is a running-min window over the SAME
    * `(partitionBy entity, orderBy ts)` spec, so Catalyst plans ONE
    * exchange + ONE sort for the whole chain regardless of stage count;
    * the per-entity rollup reuses that partitioning and only `stages`-many
    * counters reach the final single-row aggregation. No collected event
    * lists, no per-stage re-shuffles.
    *
    * Determinism under timestamp ties: the windows use the default RANGE
    * frame (all ts-peers included), and stage progression requires a
    * STRICT `prev < ts` — so same-instant events never qualify each other
    * and the result is independent of the arbitrary order among equal
    * timestamps.
    */
  def funnel(
      events: DataFrame,
      entity: Column,
      ts: Column,
      eventType: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(entity).orderBy(ts)
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (s, i)) =>
      val qualifies =
        if (i == 0) eventType === s
        else eventType === s && col(s"_q${i - 1}") < ts
      df.withColumn(s"_q$i", min(when(qualifies, ts)).over(w))
    }
    val perEntity = staged
      .groupBy(entity.as("_e"))
      .agg(min(col("_q0")).as("_t0"),
        (1 until stages.length).map(i => min(col(s"_q$i")).as(s"_t$i")): _*)
    val counts = perEntity.agg(
      count(col("_t0")).as("_n0"),
      (1 until stages.length).map(i => count(col(s"_t$i")).as(s"_n$i")): _*)
    val rows = stages.zipWithIndex.map { case (s, i) =>
      // explicit zero guard: Spark's non-ANSI Divide yields NULL for x/0
      // while an IEEE engine (the DuckDB oracle) yields inf/NaN — pin the
      // empty-previous-stage case to NULL in BOTH engines
      struct(
        lit(i).as("stage_idx"), lit(s).as("stage"), col(s"_n$i").as("n_users"),
        (if (i == 0) lit(null).cast("double")
         else when(col(s"_n${i - 1}") > 0,
           col(s"_n$i").cast("double") / col(s"_n${i - 1}").cast("double"))
           .otherwise(lit(null).cast("double")))
          .as("pct_of_prev"))
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"), col("r.pct_of_prev"))
      .orderBy(col("stage_idx"))
  }

  /** Exact per-group z-score outlier detection with NO floating-point in
    * the decision: the k-sigma test
    * `(x − μ)² > k²·σ²` (sample variance) cross-multiplies to
    * `(n·x − Σx)² · (n−1)  >  k² · n · (n·Σx² − (Σx)²)` — every term an
    * exact integer once values arrive as fixed-point longs (cents,
    * micro-units), so the outlier SET is bit-identical across engines,
    * partitionings, and fold orders, where a naive avg/stddev pipeline is
    * hostage to float summation order. Arithmetic runs in decimal(38,0)
    * on SHIFTED values: both sides of the test are invariant under
    * `x → x − c`, so values enter as offsets from their group MINIMUM and
    * every product scales with the group's SPREAD R, not its absolute
    * magnitude. Binding term k²·n·(n·Σx'²) ≲ k²·n³·R², so the honest
    * envelope at k = 3 is n³·R² ≤ 10³⁷ — e.g. n ≤ 10⁸ rows at spread
    * R ≤ 10⁶ fixed-point units, or n ≤ 10⁹ at R ≤ 3·10⁴. Exceeding it
    * fails loudly under ANSI (decimal overflow), never silently; the
    * unshifted form binds on |x|'s absolute magnitude and dies orders of
    * magnitude earlier.
    *
    * Scale shape: one map-side-combined groupBy for the anchors, one for
    * the shifted (n, Σx', Σx'²) — three numbers per group, mergeable, the
    * same state a distributed variance always needs — then both
    * group-cardinality frames join back on the key. The joins carry NO
    * forced broadcast hint: with low-cardinality groups Spark/AQE
    * broadcasts them and the test is a map-only filter on the fact scan
    * (the q176 plan); with 10⁸-cardinality keys a forced broadcast would
    * OOM the driver, and AQE's size-based choice degrades gracefully to a
    * shuffle join instead — the rfmSegments cardinality-caveat discipline.
    *
    * Returns the outlier rows: `idCols ++ keyCols ++ (valueCol, side)`
    * where `side` is 'high'/'low' by the sign of `n·x − Σx`. Groups with
    * n < 2 have no defined variance and emit nothing.
    */
  def exactOutliers(
      df: DataFrame,
      idCols: Seq[String],
      keyCols: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    // pass 1: per-group anchor (any per-group constant works; min keeps
    // shifted values non-negative)
    val anchors = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(valueCol)).as("_mn"))
    val shifted = df.join(anchors, keyCols)
      .withColumn("_x", (col(valueCol) - col("_mn")).cast("decimal(19,0)"))
    // pass 2: sufficient statistics of the SHIFTED values
    val stats = shifted
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).cast(d38).as("_n"),
        sum(col("_x").cast(d38)).cast(d38).as("_s1"),
        sum(col("_x") * col("_x")).cast(d38).as("_s2"))
      .where(col("_n") >= 2)
    val dev = col("_n") * col("_x").cast(d38) - col("_s1")
    shifted.join(stats, keyCols)
      .where(dev * dev * (col("_n") - 1) >
        lit(k.toLong * k) * col("_n") * (col("_n") * col("_s2") - col("_s1") * col("_s1")))
      .select(
        (idCols ++ keyCols).map(col) ++ Seq(
          col(valueCol),
          when(dev > 0, lit("high")).otherwise(lit("low")).as("side")): _*)
  }

  /** Globally-ordered running (prefix) sum WITHOUT a single-partition
    * window: the scalable form of `sum(v) OVER (ORDER BY …)`, which Spark
    * otherwise plans as one task holding the entire frame. Two-level, the
    * same shape as Curation.tokenBudgetSample's budget scan:
    * `repartitionByRange` buckets rows contiguously in sort order (bucket
    * id = partition id, pinned by an eager persist so both consumers see
    * ONE sampled boundary set), per-bucket totals aggregate in parallel, a
    * tiny window over ≤`buckets` total rows computes each bucket's
    * starting offset, and a per-bucket window adds offsets to in-bucket
    * running sums — every window task sees ~1/`buckets` of the frame.
    * The cum values are invariant to where the sampled boundaries fall
    * because `sortCols` must be a TOTAL order (pass a tie-break column;
    * with ties split across adjacent buckets the bucket order would
    * otherwise be nondeterministic).
    */
  def orderedPrefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      cumCol: String,
      buckets: Int = 64): DataFrame = {
    val ranged = graft.core.Caching.eager(
      df.repartitionByRange(buckets, sortCols: _*)
        .withColumn("_bucket", spark_partition_id().cast("long")))
    val offsets = ranged
      .groupBy(col("_bucket"))
      .agg(sum(col(valueCol)).as("_bt"))
      .withColumn("_offset",
        coalesce(
          sum(col("_bt")).over(Window.orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)))
      .select(col("_bucket"), col("_offset"))
    val wIn = Window.partitionBy(col("_bucket")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets), Seq("_bucket"))
      .withColumn(cumCol, sum(col(valueCol)).over(wIn) + col("_offset"))
      .drop("_bucket", "_offset")
  }

  /** Per-GROUP ordered running sum — [[orderedPrefixSum]] with a
    * low-cardinality group dimension, the same two-level ranged shape as
    * [[groupedOrderedRank]]: range-partition on (group ++ sort) pins
    * contiguous buckets (eager persist → one sampled boundary set),
    * per-(group, bucket) subtotals aggregate in parallel, a tiny window
    * over ≤|groups|·`buckets` rows yields each bucket's per-group
    * starting offset and the group total, and the in-bucket cumulative
    * window sees ~1/`buckets` of the frame. `sortCols` must totally
    * order within each group for boundary-invariant cums.
    *
    * Returns `df ++ (cumCol: running sum within group, totalCol: group
    * total)`.
    */
  def groupedOrderedPrefixSum(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      valueCol: String,
      cumCol: String,
      totalCol: String,
      buckets: Int = 64): DataFrame = {
    val gc = groupCols.map(col)
    val ranged = graft.core.Caching.eager(
      df.repartitionByRange(buckets, gc ++ sortCols: _*)
        .withColumn("_bucket", spark_partition_id().cast("long")))
    val wOff = Window.partitionBy(gc: _*).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged
      .groupBy(gc :+ col("_bucket"): _*)
      .agg(sum(col(valueCol)).as("_bt"))
      .select(gc ++ Seq(
        col("_bucket"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_offset"),
        sum(col("_bt")).over(wTot).as(totalCol)): _*)
    val wIn = Window.partitionBy(gc :+ col("_bucket"): _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets), groupCols :+ "_bucket")
      .withColumn(cumCol, sum(col(valueCol)).over(wIn) + col("_offset"))
      .drop("_bucket", "_offset")
  }

  /** Per-group ordered rank + group size WITHOUT sorting any fact-sized
    * frame under a low-cardinality window: the scalable form of
    * `row_number() OVER (PARTITION BY g ORDER BY …)` when `g` has few
    * values — which Spark otherwise plans as one task sorting ~1/|g| of
    * the entire table. Two-level, the [[orderedPrefixSum]] discipline
    * applied to ranks: `repartitionByRange` on `(group ++ sort)` buckets
    * rows contiguously in (group, sort) order (bucket id = partition id,
    * pinned by the eager persist so every consumer sees ONE sampled
    * boundary set), per-(group, bucket) counts aggregate in parallel, a
    * tiny window over ≤|groups|·`buckets` count rows computes each
    * bucket's per-group starting offset AND the group total, and the
    * in-bucket `row_number` runs under a window partitioned by
    * (group, bucket) — every window task sees ~1/`buckets` of the frame.
    * Ranks are boundary-invariant because `sortCols` must be a TOTAL
    * order within each group (pass a tie-break column): equal full keys
    * never split across adjacent buckets, and with a total order there
    * are no equal full keys.
    *
    * Returns `df ++ (rankCol: 1-based rank within group, countCol: group
    * size)`, both BIGINT.
    */
  def groupedOrderedRank(
      df: DataFrame,
      groupCols: Seq[String],
      sortCols: Seq[Column],
      rankCol: String,
      countCol: String,
      buckets: Int = 64): DataFrame = {
    val gc = groupCols.map(col)
    val ranged = graft.core.Caching.eager(
      df.repartitionByRange(buckets, gc ++ sortCols: _*)
        .withColumn("_bucket", spark_partition_id().cast("long")))
    val wOff = Window.partitionBy(gc: _*).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged
      .groupBy(gc :+ col("_bucket"): _*)
      .agg(count(lit(1)).as("_bc"))
      .select(gc ++ Seq(
        col("_bucket"),
        coalesce(sum(col("_bc")).over(wOff), lit(0L)).as("_offset"),
        sum(col("_bc")).over(wTot).as(countCol)): _*)
    val wIn = Window.partitionBy(gc :+ col("_bucket"): _*).orderBy(sortCols: _*)
    ranged
      .join(broadcast(offsets), groupCols :+ "_bucket")
      .withColumn(rankCol, col("_offset") + row_number().over(wIn).cast("long"))
      .drop("_bucket", "_offset")
  }

  /** EXACT per-group percentiles WITHOUT the per-group value multiset:
    * the scale-safe twin of Spark's `percentile` aggregate, whose buffer
    * is O(group size) and therefore a fact-scale OOM hazard (PlanAuditSpec
    * guards exactly that shape). Here the fact frame collapses to the
    * VALUE DIMENSION first — one map-side-combined `(group, value) → cnt`
    * aggregate — the cumulative pass runs over that aggregate-sized frame
    * (guard-legal; at extreme value cardinality the q218 two-level
    * ranged prefix sum is the drop-in), and each requested percentile is
    * picked by RANK: with `r = p·(n−1)`, the flanking order statistics
    * are `min(value | cum ≥ ⌊r⌋+1)` and `min(value | cum ≥ ⌊r⌋+2)` inside
    * ONE final aggregate, then linear interpolation `lo + (hi−lo)·(r−⌊r⌋)`
    * reproduces `percentile`'s result (bit-equality spec-pinned against
    * the built-in, including non-dyadic p and ties). Also emits
    * `n_rows` / `min_value` / `max_value` for free — they come out of the
    * same passes.
    *
    * NULL values are skipped, matching the built-in (`percentile` ignores
    * nulls; `n_rows` is the NON-NULL count). A group whose values are ALL
    * null is absent from the output — the built-in would emit it with a
    * null statistic; callers that must keep such groups join back left
    * (as [[featureScale]] does).
    *
    * `cntCol`: callers that already hold a value-dimension (or otherwise
    * weighted) frame pass their count column here — each row then stands
    * for `cntCol` occurrences of its value, so the caller's text/fact scan
    * runs ONCE for both this pass and any sibling totals it computes from
    * the same tiny aggregate (as [[graft.operators.Curation
    * .lengthPercentiles]] does for its all-docs `n_docs`).
    *
    * Returns one row per group: groupCols, n_rows, min_value, max_value,
    * then one double column per `(name, p)` in `ps`.
    */
  def exactPercentilesByValue(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[(String, Double)],
      cntCol: Option[String] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val keys = groupCols.map(col)
    val counts = df
      .where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(cntCol.map(c => sum(col(c))).getOrElse(count(lit(1))).as("_cnt"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = counts
      .withColumn("_cum", sum(col("_cnt")).over(wCum))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
    val pieces: Seq[Column] =
      Seq(max(col("_n")).as("n_rows"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value")) ++
        ps.flatMap { case (nm, p) =>
          val fl = floor(lit(p) * (col("_n") - 1).cast("double"))
          Seq(
            min(when(col("_cum") >= fl + 1, col(valueCol))).as(s"_lo_$nm"),
            min(when(col("_cum") >= fl + 2, col(valueCol))).as(s"_hi_$nm"))
        }
    val stats = cum.groupBy(keys: _*).agg(pieces.head, pieces.tail: _*)
    ps.foldLeft(stats) { case (d, (nm, p)) =>
      val r = lit(p) * (col("n_rows") - 1).cast("double")
      // Spark's Percentile interpolates as
      //   (higher − position)·lower + (position − lower)·higher
      // NOT lower + frac·(higher − lower): the two differ by an ulp on
      // non-dyadic positions, and this operator promises BIT equality
      // (property-spec-pinned against the built-in)
      d.withColumn(nm,
        when(ceil(r) === floor(r), col(s"_lo_$nm").cast("double"))
          .otherwise(
            (ceil(r) - r) * col(s"_lo_$nm").cast("double") +
              (r - floor(r)) * col(s"_hi_$nm").cast("double")))
        .drop(s"_lo_$nm", s"_hi_$nm")
    }
  }

  /** QUANTILE NORMALIZATION: map every group's values onto the GLOBAL
    * value distribution by rank — row with within-group rank `i` of `n_g`
    * becomes the global order statistic at the proportional position,
    * `k = round((i−1)·(N−1) / (n_g−1))` (0-based; a singleton group maps
    * to the global median position). The distribution-alignment transform
    * feature pipelines use when groups (sources, batches, labs) disagree
    * on scale AND shape — where [[featureScale]]'s affine maps can only
    * fix location/spread.
    *
    * Everything is exact integer arithmetic: ranks come from
    * [[groupedOrderedRank]] (two-level — no fact-sized sort under a
    * low-cardinality group key; `tieCols` must make the within-group
    * order TOTAL), the target position is a rounded INTEGER division
    * (`(2·(i−1)·(N−1) + (n_g−1)) div (2·(n_g−1))` — no float rounding to
    * pin; the doubled products stay in BIGINT up to ~2×10⁹ rows, past
    * which lift them to decimal), and the global inverse CDF is the
    * value DIMENSION's prefix-sum frame ([[orderedPrefixSum]]) probed by
    * [[RangeJoin.intervalJoin]]'s chunked point-in-interval join — the
    * global sorted array never materializes anywhere.
    *
    * NULL values are excluded (rank-based mapping is undefined for them);
    * callers that keep null rows re-attach them. Returns the non-null
    * input rows plus `normCol` — the global value at the row's mapped
    * position.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCols: Seq[Column],
      normCol: String = "normalized",
      buckets: Int = 64): DataFrame = {
    val reserved = Seq("_i", "_ng", "_N", "_k", "_gv", "_gc", "_cum", "_lo", "_hi")
    require(!df.columns.exists(reserved.contains),
      s"quantileNormalize reserves column names ${reserved.mkString(", ")}")
    val vals = df.where(col(valueCol).isNotNull)
    val ranked = groupedOrderedRank(
      vals, groupCols, col(valueCol).asc +: tieCols, "_i", "_ng", buckets)
    val cum = orderedPrefixSum(
      vals.groupBy(col(valueCol).as("_gv")).agg(count(lit(1)).as("_gc")),
      sortCols = Seq(col("_gv").asc), valueCol = "_gc", cumCol = "_cum",
      buckets = buckets)
    val withK = graft.core.ScalarJoin.withScalars(
        ranked, vals.agg(count(lit(1)).as("_N")))
      .withColumn("_k",
        when(col("_ng") === 1, expr("(_N - 1) div 2"))
          .otherwise(expr(
            "((_i - 1) * (_N - 1) * 2 + (_ng - 1)) div (2 * (_ng - 1))")))
    RangeJoin.intervalJoin(
        withK, "_k",
        cum.select(col("_gv").as(normCol),
          (col("_cum") - col("_gc")).as("_lo"), col("_cum").as("_hi")),
        "_lo", "_hi", chunkWidth = 1024.0)
      .drop("_i", "_ng", "_N", "_k", "_lo", "_hi")
  }

  /** Per-group feature scaling for training pipelines: min-max
    * (`(x−min)/(max−min)`) and robust (`(x−median)/IQR`) normalization of
    * an INTEGER value column, with every statistic exact so the scaled
    * doubles are bit-identical across engines and partitionings: min/max
    * are integers, and quartiles of integers interpolate at dyadic
    * fractions (exact 0.25-multiples — the q87/q189 discipline), so each
    * scaled value is ONE IEEE division of two exact numbers. Degenerate
    * groups (zero range / zero IQR) yield null for that scaling rather
    * than ±Inf/NaN.
    *
    * Scale shape: the stats come from [[exactPercentilesByValue]] — the
    * value-dimension pass, NO per-group value multiset — broadcast back,
    * scaling map-side on the fact scan.
    */
  def featureScale(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val stats = exactPercentilesByValue(df, keyCols, valueCol,
      Seq("_q1" -> 0.25, "_med" -> 0.5, "_q3" -> 0.75))
      .select(keyCols.map(col) ++ Seq(
        col("min_value").as("_mn"), col("max_value").as("_mx"),
        col("_q1"), col("_med"), col("_q3")): _*)
    // LEFT join: a group whose values are all null has no stats row (see
    // exactPercentilesByValue) — its rows must survive with null scalings,
    // exactly as the built-in's null statistics would have scaled them
    df.join(broadcast(stats), keyCols, "left")
      .withColumn("minmax_scaled",
        when(col("_mx") > col("_mn"),
          (v - col("_mn")).cast("double") /
            (col("_mx") - col("_mn")).cast("double")))
      .withColumn("robust_scaled",
        when(col("_q3") > col("_q1"),
          (v.cast("double") - col("_med")) / (col("_q3") - col("_q1"))))
      .drop("_mn", "_mx", "_q1", "_med", "_q3")
  }

  /** 2-D skyline (Pareto frontier): the distinct `(x, y)` pairs not
    * DOMINATED by any other — `(x', y')` dominates `(x, y)` when
    * `x' ≥ x ∧ y' ≤ y` with at least one strict (maximize `x`, minimize
    * `y`). The classic OLAP operator Spark has no native form of,
    * decomposed so nothing fact-sized sorts: one map-side-combined
    * `min(y)` per distinct `x`, a suffix-min over the x-DIMENSION
    * (`x` must be low-cardinality — qty levels, ratings, tiers; the
    * global ordered pass is |distinct x| rows, and the scaladoc contract
    * is the same dimension-bounded caveat as every global window here),
    * then the frontier test is a broadcast join + map-side filter on the
    * aggregated pair frame.
    *
    * A pair survives iff `y = min(y at x)` AND `y < min(y at any x' > x)`
    * — strictly better than everything to the right, tied-or-equal pairs
    * at the same x collapse to the distinct pair. Returns
    * `(x, y, n_rows)` frontier points with their multiplicity.
    */
  def skyline2D(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    val pairs = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("n_rows"))
    val perX = pairs.groupBy(col(xCol)).agg(min(col(yCol)).as("_miny"))
    val wSuffix = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = perX
      .withColumn("_best_right", min(col("_miny")).over(wSuffix))
      .where(col("_best_right").isNull || col("_miny") < col("_best_right"))
      .select(col(xCol), col("_miny"))
    pairs.join(broadcast(frontierX), Seq(xCol))
      .where(col(yCol) === col("_miny"))
      .select(col(xCol), col(yCol), col("n_rows"))
  }

  private def dedupOrdered(df: DataFrame, keys: Seq[Column], ordered: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordered: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
