package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityChecks._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotals resets at year boundaries") {
    val df = Seq(
      ("k", Date.valueOf("2023-12-30"), 10),
      ("k", Date.valueOf("2023-12-31"), 20),
      ("k", Date.valueOf("2024-01-01"), 5)
    ).toDF("k", "d", "v")
    val out = Analytics
      .runningTotals(df, Seq(col("k")), Seq(col("d")), col("v"), resetBy = Some("year"))
      .orderBy("d")
      .select("running_total").as[Long].collect()
    assert(out.sameElements(Array(10L, 30L, 5L)), s"got ${out.mkString(",")}")
  }

  test("lagLead computes deltas and zero-guarded pct change") {
    val df = Seq(("k", 1, 100), ("k", 2, 0), ("k", 3, 50)).toDF("k", "t", "v")
    val out = Analytics
      .lagLead(df, Seq(col("k")), Seq(col("t")), col("v"), Seq(1))
      .orderBy("t")
      .select("delta_1", "pct_change_1")
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getInt(0) == -100 && out(1).getDouble(1) == -100.0)
    assert(out(2).getInt(0) == 50 && out(2).isNullAt(1), "lag=0 → pct null (NULLIF)")
  }

  test("timeSeriesGaps finds only above-threshold gaps") {
    val df = Seq(
      ("k", Date.valueOf("2024-01-01")),
      ("k", Date.valueOf("2024-01-03")),
      ("k", Date.valueOf("2024-03-01"))
    ).toDF("k", "d")
    val gaps = Analytics.timeSeriesGaps(df, Seq(col("k")), col("d"), maxGapDays = 30)
      .select("gap_days").as[Int].collect()
    assert(gaps.sameElements(Array(58)))
  }

  test("cohortRetention: period 0 retention is 100%") {
    val df = Seq(
      (1L, Date.valueOf("2024-01-05")),
      (2L, Date.valueOf("2024-01-20")),
      (1L, Date.valueOf("2024-02-10"))
    ).toDF("u", "d")
    val out = Analytics.cohortRetention(df, col("u"), col("d"))
      .orderBy("period_number")
      .collect()
    assert(out(0).getInt(1) == 0 && out(0).getLong(2) == 2 && out(0).getDouble(4) == 100.0)
    assert(out(1).getInt(1) == 1 && out(1).getLong(2) == 1 && out(1).getDouble(4) == 50.0)
  }

  test("dataQuality classifies PASS / WARNING / FAIL") {
    val df = (1 to 100).map { i =>
      (if (i <= 3) null else s"v$i", if (i <= 10) -1 else i) // 3% nulls, 10% negatives
    }.toDF("name", "amount")
    val out = QualityChecks
      .dataQuality(df, Seq(NullCheck("name"), RangeCheck("amount", 0, 1000), DuplicateCheck(Seq("amount"))))
      .collect()
      .map(r => r.getString(0) -> r.getString(4))
      .toMap
    assert(out("null_check_name") == "WARNING")
    assert(out("range_check_amount") == "FAIL")
    assert(out("duplicate_check_amount") == "FAIL") // -1 repeated 10× → 9 dups > 5%
  }

  test("funnel: stages require strict ordering; ties and reversed order don't qualify") {
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$s%02d")
    val events = Seq(
      // user 1: full ordered funnel
      (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
      // user 2: view only
      (2L, t(1), "view"),
      // user 3: click BEFORE view — click must not qualify
      (3L, t(1), "click"), (3L, t(2), "view"),
      // user 4: click at the SAME instant as view — strict < excludes it
      (4L, t(1), "view"), (4L, t(1), "click"),
      // user 5: view → click, purchase before click — no purchase credit
      (5L, t(1), "view"), (5L, t(2), "purchase"), (5L, t(3), "click")
    ).toDF("user_id", "ts", "event_type")

    val out = Analytics.funnel(events.repartition(3),
      col("user_id"), col("ts"), col("event_type"), Seq("view", "click", "purchase"))
      .collect()
    val byStage = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byStage == Map("view" -> 5L, "click" -> 2L, "purchase" -> 1L))
    val pct = out.map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(pct(0).isEmpty && pct(1).contains(2.0 / 5.0) && pct(2).contains(1.0 / 2.0))
  }

  test("funnel plans one exchange for the whole stage chain") {
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$s%02d")
    val events = Seq((1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val plan = Analytics.funnel(events, col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    val keyExchanges = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(keyExchanges == 1,
      s"all stage windows must share one entity shuffle, got $keyExchanges:\n$plan")
  }

  test("time-RANGE frame: peers enter and leave by timestamp distance, not row count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(t0.plusSeconds(m * 60))
    val ev = Seq((1L, ts(0)), (2L, ts(30)), (3L, ts(70)), (4L, ts(200)))
      .toDF("event_id", "ts").withColumn("user_id", lit(7L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    val got = ev.select($"event_id", count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // minute 70: event at 30 (40 ago) is in; event at 0 (70 ago) is OUT —
    // a ROWS-2 frame would have counted it
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), s"got $got")
    // boundary: exactly 60 minutes apart is INSIDE the inclusive bound
    val edge = Seq((1L, ts(0)), (2L, ts(60))).toDF("event_id", "ts")
      .withColumn("user_id", lit(1L))
      .select($"event_id", count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge(2L) == 2L, "RANGE bounds are inclusive")
  }

  test("rollup emits detail, per-prefix subtotal, and grand-total rows with the GROUPING bitmask") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sales = Seq(
      ("eu", "de", 10L), ("eu", "de", 5L), ("eu", "fr", 7L),
      ("us", "us", 20L)
    ).toDF("region", "nation", "amt")
    val out = sales.rollup($"region", $"nation")
      .agg(grouping_id().cast("long").as("level"), sum($"amt").as("total"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (Some("eu"), Some("de"), 0L, 15L),
      (Some("eu"), Some("fr"), 0L, 7L),
      (Some("us"), Some("us"), 0L, 20L),
      (Some("eu"), None, 1L, 22L),       // region subtotal: low bit = nation rolled up
      (Some("us"), None, 1L, 20L),
      (None, None, 3L, 42L)),            // grand total: both bits set
      s"got $out")
  }

  test("cube emits all four margins; the bitmask separates a margin NULL from a data NULL") {
    import org.apache.spark.sql.functions._
    val sales = Seq(
      (Some("2024"), "A", 10L), (Some("2024"), "B", 5L),
      (None: Option[String], "A", 7L) // genuine NULL key in the data
    ).toDF("yr", "flag", "amt")
    val out = sales.cube($"yr", $"flag")
      .agg(grouping_id().cast("long").as("level"), sum($"amt").as("total"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
      .toSet
    // detail row (None, A, level=0) is DATA; margin row (None, A, level=2)
    // is the per-flag rollup — same key tuple, different bitmask
    assert(out.contains((None, Some("A"), 0L, 7L)), s"data NULL lost: $out")
    assert(out.contains((None, Some("A"), 2L, 17L)), s"flag margin lost: $out")
    assert(out.contains((Some("2024"), None, 1L, 15L)), s"year margin lost: $out")
    assert(out.contains((None, None, 3L, 22L)), s"grand total lost: $out")
    assert(out.count(_._3 == 0L) == 3, s"detail rows: $out")
  }

  test("intersect/except are DISTINCT set ops: duplicates collapse, membership decides") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 4L).toDF("k")
    assert(a.intersect(b).collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(a.except(b).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("gap-fill densifies each key to its own span, zero-fills, and carries the last observed value") {
    import org.apache.spark.sql.functions._
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 2L, 10.0),
      (1L, Date.valueOf("2024-01-04"), 1L, 3.0),  // 2 gap days before it
      (2L, Date.valueOf("2024-02-01"), 5L, 7.0)   // singleton span: no fill rows
    ).toDF("user_id", "day", "n", "mx")
    val cal = daily.groupBy("user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
      .rowsBetween(Long.MinValue, 0)
    val out = cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n"),
        last($"mx", ignoreNulls = true).over(w).as("carried"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01", 2L, 10.0),
      (1L, "2024-01-02", 0L, 10.0), // zero-filled, carry from Jan 1
      (1L, "2024-01-03", 0L, 10.0),
      (1L, "2024-01-04", 1L, 3.0),  // fresh observation replaces the carry
      (2L, "2024-02-01", 5L, 7.0)), // span never leaks past the key's own max
      s"got $out")
  }

  test("exactOutliers: hand-computed k-sigma sets, high and low sides, n<2 groups dropped") {
    import spark.implicits._
    import graft.operators.Analytics
    // group hi: twenty 10s + one 100 -> only the 100 clears k=3
    // group lo: twenty 100s + one 10 -> only the 10 clears k=3 (low side)
    // group single: n=1 has no variance, never emits
    val rows =
      (1L to 20L).map(i => (i, "hi", 10L)) ++ Seq((21L, "hi", 100L)) ++
      (31L to 50L).map(i => (i, "lo", 100L)) ++ Seq((51L, "lo", 10L)) ++
      Seq((61L, "single", 7L))
    val df = rows.toDF("id", "grp", "cents")
    val out = Analytics.exactOutliers(df, Seq("id"), Seq("grp"), "cents", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(out == Set((21L, "hi", 100L, "high"), (51L, "lo", 10L, "low")), s"got $out")
    // k=5 excludes both (hi group: LHS (21·100−300)²·20 = 6.48e7 vs
    // RHS 25·21·162000 = 8.5e7; note k=4 would still flag — RHS 5.44e7)
    val none = Analytics.exactOutliers(df, Seq("id"), Seq("grp"), "cents", k = 5)
    assert(none.count() == 0)
    // partition invariance: the verdict is integer arithmetic
    val parts = Analytics.exactOutliers(df.repartition(7), Seq("id"), Seq("grp"), "cents", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(parts == out)
  }

  test("orderedPrefixSum equals the single-partition window cumsum at any bucket count") {
    import spark.implicits._
    import graft.operators.Analytics
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, ((i * 37) % 101).toDouble)).toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(12,2)").as("v"))
    val naive = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("v").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum").cast("decimal(20,2)").as("cum"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    for (buckets <- Seq(1, 7, 64)) {
      val two = Analytics.orderedPrefixSum(
          df, Seq(col("v").desc, col("id").asc), "v", "cum", buckets)
        .select(col("id"), col("cum").cast("decimal(20,2)").as("cum"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      assert(two == naive, s"bucket count $buckets must not change any cum value")
    }
  }

  test("featureScale: hand-computed scalings; degenerate groups yield null") {
    import spark.implicits._
    import graft.operators.Analytics
    // group a: values 0,10,20,30 -> q1=7.5, med=15, q3=22.5, IQR=15
    // group b: constant 5 -> both scalings degenerate
    val df = Seq(
      (1L, "a", 0L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L), (6L, "b", 5L)
    ).toDF("id", "g", "v")
    val out = Analytics.featureScale(df, Seq("g"), "v")
      .select("id", "minmax_scaled", "robust_scaled")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out(0) == ((1L, Some(0.0), Some(-1.0))))            // (0-15)/15
    assert(out(1) == ((2L, Some(10.0 / 30.0), Some(-5.0 / 15.0))))
    assert(out(3) == ((4L, Some(1.0), Some(1.0))))             // (30-15)/15
    assert(out(4)._2.isEmpty && out(4)._3.isEmpty,
      "zero range and zero IQR must scale to null, not Inf/NaN")
  }

  test("groupedOrderedPrefixSum equals the per-group window cumsum at any bucket count") {
    import spark.implicits._
    import graft.operators.Analytics
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 300L).map(i => (i, s"g${i % 4}", (i * 13) % 23)).toDF("id", "g", "w")
    val wCum = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("g"))
    val naive = df
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    for (buckets <- Seq(1, 5, 32)) {
      val two = Analytics.groupedOrderedPrefixSum(
          df, Seq("g"), Seq(col("id").asc), "w", "cum", "tot", buckets)
        .select("id", "cum", "tot")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(two == naive, s"bucket count $buckets must not change any (cum, tot)")
    }
  }

  test("skyline2D: hand-built frontier with ties, duplicates, and strict dominance") {
    import spark.implicits._
    import graft.operators.Analytics
    // maximize x, minimize y. points:
    //  (1,5)x2      frontier (nothing with x>=1 has y<=5 strictly better? (2,3) dominates: x 2>1, y 3<5 -> NO, dominated)
    //  (2,3)        dominated by (3,3)? x 3>2, y 3<=3, one strict -> dominated
    //  (3,3)        frontier? (4,4): y 4>3 no; (3,3) vs itself no; -> frontier
    //  (3,7)        dominated by (3,3) (same x, smaller y)
    //  (4,4)        frontier (max x among y<=4? (3,3) has smaller x -> no dominator with x>=4)
    val df = Seq(
      (1L, 5L), (1L, 5L), (2L, 3L), (3L, 3L), (3L, 7L), (4L, 4L)
    ).toDF("x", "y")
    val out = Analytics.skyline2D(df, "x", "y")
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 3L, 1L), (4L, 4L, 1L)),
      s"frontier must be {(3,3),(4,4)} — equal-y right neighbors dominate " +
        s"((2,3) falls to (3,3)), same-x worse points fall, got ${out.toSeq}")
  }

  test("skyline2D: duplicates of a frontier point carry their multiplicity") {
    import spark.implicits._
    import graft.operators.Analytics
    val df = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)).toDF("x", "y")
    val out = Analytics.skyline2D(df, "x", "y")
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 1L, 1L)),
      s"(1,2) is dominated by (2,1) on both axes, got ${out.toSeq}")
    val df2 = Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("x", "y")
    val out2 = Analytics.skyline2D(df2, "x", "y")
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out2.toSeq == Seq((1L, 1L, 2L), (2L, 2L, 1L)),
      s"incomparable points both survive; multiplicity rides along, got ${out2.toSeq}")
  }

  test("groupedOrderedRank equals the per-group window rank at any bucket count") {
    import spark.implicits._
    import graft.operators.Analytics
    import org.apache.spark.sql.expressions.Window
    // 3 groups × uneven sizes, duplicate values (tie-break on id required)
    val df = (1L to 400L)
      .map(i => (i, s"g${i % 3}", (i * 37) % 19))
      .toDF("id", "grp", "v")
    val w = Window.partitionBy(col("grp")).orderBy(col("v").asc, col("id").asc)
    val naive = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("grp"))).cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    for (buckets <- Seq(1, 5, 32)) {
      val two = Analytics.groupedOrderedRank(
          df, Seq("grp"), Seq(col("v").asc, col("id").asc), "rn", "n", buckets)
        .select("id", "rn", "n")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(two == naive, s"bucket count $buckets must not change any (rank, n)")
    }
  }

  test("quantileNormalize: rank-proportional global mapping, exact semantics") {
    // global sorted values: [1, 3, 5, 7, 42, 100, 200] (N=7 — the singleton
    // group's own value is part of the global distribution)
    // groups a = [1, 5, 100] and b = [3, 7, 200] (ng=3): ranks 1,2,3 ->
    //   k = round((i-1)*6/2) = 0, 3, 6 -> values 1, 7, 200 — ALIGNED
    // group c = [42] singleton -> global median position k = (7-1) div 2 = 3 -> 7
    // a null value row is excluded entirely
    val df = Seq(
      ("a", 1L, Some(1L)), ("a", 2L, Some(5L)), ("a", 3L, Some(100L)),
      ("b", 4L, Some(3L)), ("b", 5L, Some(7L)), ("b", 6L, Some(200L)),
      ("c", 7L, Some(42L)), ("c", 8L, Option.empty[Long])
    ).toDF("grp", "id", "v")
    val out = Analytics.quantileNormalize(
        df.where(col("v").isNotNull).select(col("grp"), col("id"),
          col("v").cast("long").as("v"))
          .unionByName(df.where(col("v").isNull)
            .select(col("grp"), col("id"), col("v").cast("long").as("v"))),
        Seq("grp"), "v", tieCols = Seq(col("id").asc), normCol = "nv",
        buckets = 4)
      .select("id", "nv").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 7L, 3L -> 200L,
      4L -> 1L, 5L -> 7L, 6L -> 200L,
      7L -> 7L),
      s"groups a and b must align onto the same global order statistics, got $out")
    assert(!out.contains(8L), "null values are excluded from the mapping")
  }
}
