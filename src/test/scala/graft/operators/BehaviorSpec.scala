package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: order matters — out-of-order steps do not count") {
    // u1 completes signup→view→click; u2 has a view BEFORE its signup (the
    // pre-signup view must not reach step 2, and with no later view the
    // funnel stops); u3 never signs up (reaches nothing)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "click"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "click"))
      .orderBy("step_index").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "signup", 2L), (2L, "view", 1L), (3L, "click", 1L)),
      s"only u1 passes view/click; u2's pre-signup view must not count, got ${out.toSeq}")
  }

  test("funnel: an equal-timestamp next-step event counts (at-or-after)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view"))
      .orderBy("step_index").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 1L), "ts >= prev-step ts is inclusive")
  }

  test("funnel: pct_of_first is the exact integer ratio") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (3L, ts("2024-01-01 10:00:00"), "a"),
      (4L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type", Seq("a", "b"))
      .orderBy("step_index").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(1.0, 0.25))
  }

  test("retentionMatrix: hand-built two-cohort triangle") {
    // cohort 0: u1 (active periods 0,1,2), u2 (0 only)
    // cohort 1: u3 (active periods 1,2 → offsets 0,1)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 08:00:00")), (3L, ts("2024-01-03 23:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.retentionMatrix(ev, "user_id", "ts", "2024-01-01", 1)
      .orderBy("cohort_period", "period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 2L), (0L, 1L, 1L, 2L), (0L, 2L, 1L, 2L),
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 1L)),
      s"got ${out.toSeq}")
  }

  test("rollingDistinctUsers: island merge, disjoint re-entry, and zero days") {
    // u1 active days 0 and 3 (one merged coverage island [0,9] for w=7... no:
    // [0,6] ∪ [3,9] = [0,9], ONE island); u2 active day 1 and day 12 — gap 11
    // > 6, TWO islands [1,7] and [12,18]; days 8..11 must count u1 only on
    // 8..9 and NOBODY on 10..11
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-04 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-13 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.rollingDistinctUsers(ev, "user_id", "ts", "2024-01-01", 7)
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = Map(
      0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 2L,
      7L -> 2L, 8L -> 1L, 9L -> 1L, 10L -> 0L, 11L -> 0L, 12L -> 1L)
    assert(out == expect, s"got ${out.toSeq.sortBy(_._1)}")
  }

  test("rollingDistinctUsers: same-day repeats never double-count within a window") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 20:00:00")),
      (1L, ts("2024-01-02 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.rollingDistinctUsers(ev, "user_id", "ts", "2024-01-01", 7)
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._2 == 1L),
      s"overlapping coverage of one user must count once, got ${out.toSeq}")
  }

  test("rollingDistinctUsers: pre-epoch events fail loudly, never undercount") {
    val ev = Seq(
      (1L, ts("2023-12-30 10:00:00")), // before the declared epoch
      (2L, ts("2024-01-05 10:00:00"))
    ).toDF("user_id", "ts")
    val boom = intercept[Exception] {
      Behavior.rollingDistinctUsers(ev, "user_id", "ts", "2024-01-01", 7).collect()
    }
    assert(boom.getMessage.contains("predate epochStart"),
      s"expected the pre-epoch guard, got: ${boom.getMessage}")
  }

  test("retentionMatrix: repeat activity in one period counts a user once") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 08:00:00")), (1L, ts("2024-01-02 21:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.retentionMatrix(ev, "user_id", "ts", "2024-01-01", 1)
      .orderBy("period_offset").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L), (1L, 1L)),
      "two same-day events must not double-count the user in a cell")
  }

  test("debounce re-anchors at KEPT events — not a fixed-window throttle") {
    // user 1 at 0h, 0.5h, 1.2h, 2.5h with gap 1h:
    //   sequential debounce keeps 0h, 1.2h (>= 0h+1h), 2.5h (>= 1.2h+1h)
    //   a FIXED hour-bucket throttle would keep 0h, 1.2h, 2.5h too — so
    //   user 2 at 0h, 0.9h, 1.7h separates them: sequential keeps 0h and
    //   1.7h (0.9h suppressed, window re-anchors at 0h so 1.7h >= 1h
    //   qualifies), while hour buckets would keep 0.9h's bucket-1... and
    //   a same-ts duplicate of a kept event is suppressed (distance 0)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00")),
      (3L, 1L, ts("2024-01-01 01:12:00")),
      (4L, 1L, ts("2024-01-01 02:30:00")),
      (5L, 2L, ts("2024-01-01 00:00:00")),
      (6L, 2L, ts("2024-01-01 00:00:00")), // same-ts duplicate, larger id
      (7L, 2L, ts("2024-01-01 00:54:00")),
      (8L, 2L, ts("2024-01-01 01:42:00"))
    ).toDF("event_id", "user_id", "ts")
    val kept = Behavior.debounce(ev, "user_id", "ts", "event_id",
        gapMicros = 3600L * 1000000)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 8L),
      s"expected re-anchored keeps {1,3,4,5,8}, got $kept")
  }

  test("debounce: non-integral key/ord and non-timestamp ts rejected at plan time") {
    val strKey = Seq((1L, "u1", ts("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val e1 = intercept[IllegalArgumentException] {
      Behavior.debounce(strKey, "user_id", "ts", "event_id", 1000000L)
    }
    assert(e1.getMessage.contains("integral"))
    val strTs = Seq((1L, 1L, "2024-01-01")).toDF("event_id", "user_id", "ts")
    val e2 = intercept[IllegalArgumentException] {
      Behavior.debounce(strTs, "user_id", "ts", "event_id", 1000000L)
    }
    assert(e2.getMessage.contains("timestamp"))
  }

  test("debounce: null timestamp raises loudly instead of an encoder NPE") {
    val ev = Seq(
      (1L, 1L, Some(ts("2024-01-01 00:00:00"))),
      (2L, 1L, None: Option[java.sql.Timestamp])
    ).toDF("event_id", "user_id", "ts")
    val e = intercept[Exception] {
      Behavior.debounce(ev, "user_id", "ts", "event_id", 1000000L).collect()
    }
    assert(e.getMessage.contains("null value") ||
      Option(e.getCause).exists(_.getMessage.contains("null value")),
      s"expected the explicit null-ts raise, got: ${e.getMessage}")
  }

  test("newVsReturning: first-ever day classifies; multiple same-day events count once") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-03 08:00:00")),
      (2L, ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.newVsReturning(ev, "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 0L), (2L, 1L, 1L)),
      s"day1: 1 new; day3: user 2 new + user 1 returning — got ${out.toSeq}")
  }
}
