package graft.dml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // key 1: gold → gold (no-op) → silver → gold; key 2: single version
  private def changes = Seq(
    (1L, ts("2026-01-01 00:00:00"), 10L, "gold"),
    (1L, ts("2026-01-02 00:00:00"), 11L, "gold"),
    (1L, ts("2026-01-03 00:00:00"), 12L, "silver"),
    (1L, ts("2026-01-05 00:00:00"), 13L, "gold"),
    (2L, ts("2026-01-04 00:00:00"), 14L, "bronze")
  ).toDF("user_id", "ts", "event_id", "tier")

  test("scd2Build: no-op suppression, 1-based versions, tiling intervals, is_current") {
    val dim = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(dim.length == 4, "the Jan-02 gold restatement opens no version")
    assert(dim(0) == ((1L, 1L, "gold", ts("2026-01-01 00:00:00"),
      Some(ts("2026-01-03 00:00:00")), false)),
      "version 1 closes at version 2's start, skipping the suppressed no-op")
    assert(dim(1) == ((1L, 2L, "silver", ts("2026-01-03 00:00:00"),
      Some(ts("2026-01-05 00:00:00")), false)))
    assert(dim(2) == ((1L, 3L, "gold", ts("2026-01-05 00:00:00"), None, true)),
      "the attribute may RETURN to an old value in a new version")
    assert(dim(3) == ((2L, 1L, "bronze", ts("2026-01-04 00:00:00"), None, true)))
  }

  test("scd2Build: same-timestamp changes are pinned by the tie-break") {
    val tied = Seq(
      (1L, ts("2026-01-01 00:00:00"), 2L, "b"),
      (1L, ts("2026-01-01 00:00:00"), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "tier")
    val dim = Scd.scd2Build(tied, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("version").collect()
    assert(dim.map(_.getString(2)).toSeq == Seq("a", "b"),
      "event_id order decides which same-ts change is version 1")
  }

  test("scd2Build: a null attribute is a real state — transitions to and from it version") {
    val withNull = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1L, Some("gold")),
      (1L, ts("2026-01-02 00:00:00"), 2L, None), // attribute becomes unknown
      (1L, ts("2026-01-03 00:00:00"), 3L, None), // adjacent null restatement: no-op
      (1L, ts("2026-01-04 00:00:00"), 4L, Some("gold"))
    ).toDF("user_id", "ts", "event_id", "tier")
    val dim = Scd.scd2Build(withNull, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("version").collect()
      .map(r => (r.getLong(1), Option(r.getString(2))))
    assert(dim.toSeq == Seq(
      (1L, Some("gold")), (2L, None), (3L, Some("gold"))),
      s"null transitions must open/close versions (null-safe compare), got ${dim.toSeq}")
  }

  test("scd2Apply ≡ scd2Build on the full stream, at every split point") {
    // fold ≡ rebuild across EVERY boundary of the fixture — covers: delta
    // restating the current attribute (opens no version), delta moving it
    // (closes current, version ordinal continues), keys untouched by the
    // delta, keys new in the delta, and an empty delta
    val full = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("user_id", "version").collect().toSeq
    val allTs = changes.select("ts").distinct()
      .collect().map(_.getTimestamp(0)).sortBy(_.getTime)
    for (cut <- allTs :+ ts("2027-01-01 00:00:00")) {
      val base = Scd.scd2Build(changes.where(col("ts") < lit(cut)),
        "user_id", "ts", "tier", Seq("event_id"))
      val applied = Scd.scd2Apply(base, changes.where(col("ts") >= lit(cut)),
          "user_id", "ts", "tier", Seq("event_id"))
        .orderBy("user_id", "version").collect().toSeq
      assert(applied == full, s"apply ≠ rebuild at cut $cut")
    }
  }

  test("scd2Apply: a delta restating every current state is a no-op") {
    val base = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
    val restate = Seq(
      (1L, ts("2026-02-01 00:00:00"), 20L, "gold"),   // current tier of key 1
      (2L, ts("2026-02-01 00:00:00"), 21L, "bronze")  // current tier of key 2
    ).toDF("user_id", "ts", "event_id", "tier")
    val applied = Scd.scd2Apply(base, restate, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("user_id", "version").collect().toSeq
    val unchanged = base.orderBy("user_id", "version").collect().toSeq
    assert(applied == unchanged,
      "restated current state must open no version and close nothing")
  }

  test("scd2Apply: a late-arriving delta fails loudly instead of corrupting history") {
    val base = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
    // key 1's current version opens after 2026-01-01; a delta BEFORE it
    // violates the no-late-arrival contract -> raise, never a negative
    // interval over closed history
    val late = Seq((1L, ts("2020-01-01 00:00:00"), 99L, "zzz"))
      .toDF("user_id", "ts", "event_id", "tier")
    val boom = intercept[Exception] {
      Scd.scd2Apply(base, late, "user_id", "ts", "tier", Seq("event_id")).collect()
    }
    assert(boom.getMessage.contains("strictly postdate the current version"),
      s"expected the late-arrival guard, got: ${boom.getMessage}")
  }

  test("scd2Apply: an equal-ts delta that MOVES the attribute fails loudly") {
    // key 1's current version opens 2026-01-05; a delta at exactly that
    // instant with a different attribute is ambiguous — its rebuild
    // position depends on the originating change's tie-break, which the
    // dimension no longer carries — so the guard rejects it instead of
    // silently picking a side (the round-13 advice finding: with a
    // strict-< guard, a tied delta whose event_id sorted BEFORE the
    // originating change made apply != rebuild)
    val base = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
    val tied = Seq((1L, ts("2026-01-05 00:00:00"), 5L, "platinum"))
      .toDF("user_id", "ts", "event_id", "tier")
    val boom = intercept[Exception] {
      Scd.scd2Apply(base, tied, "user_id", "ts", "tier", Seq("event_id")).collect()
    }
    assert(boom.getMessage.contains("strictly postdate the current version"),
      s"expected the tied-arrival guard, got: ${boom.getMessage}")
  }

  test("scd2Apply: an equal-ts RESTATEMENT is still a legal no-op") {
    // restating the current attribute at the current effective_from is
    // suppressed on both the apply and rebuild paths, so it stays legal
    // under the tightened guard (no version opens -> no close-out row ->
    // the guard never sees it)
    val base = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
    val restate = Seq((1L, ts("2026-01-05 00:00:00"), 99L, "gold"))
      .toDF("user_id", "ts", "event_id", "tier")
    val applied = Scd.scd2Apply(base, restate, "user_id", "ts", "tier", Seq("event_id"))
      .orderBy("user_id", "version").collect().toSeq
    assert(applied == base.orderBy("user_id", "version").collect().toSeq,
      "a tied restatement must change nothing")
  }

  test("pointInTimeJoin: zero-length [t,t) versions never swallow facts (tie-safe as-of)") {
    // two surviving changes at ONE timestamp produce a legal zero-length
    // version 1 [t,t) and an open version 2 [t,∞); a fact at exactly t (and
    // any fact after) must land in the SUCCESSOR, never be dropped by the
    // residual factTs < effective_to filter picking the degenerate version
    val tied = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2026-01-01 00:00:00"), 2L, "b")
    ).toDF("user_id", "ts", "event_id", "tier")
    val dim = Scd.scd2Build(tied, "user_id", "ts", "tier", Seq("event_id"))
    val facts = Seq(
      (100L, 1L, ts("2026-01-01 00:00:00")), // AT the shared boundary
      (101L, 1L, ts("2026-01-02 00:00:00"))  // strictly after
    ).toDF("fact_id", "user_id", "fts")
    val out = Scd.pointInTimeJoin(facts, dim, "user_id", "fts", "tier")
      .orderBy("fact_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(out.length == 2, "left-join guarantee: no fact row may vanish")
    assert(out(0) == ((100L, 2L, "b")),
      "a fact at the shared timestamp belongs to the open successor version")
    assert(out(1) == ((101L, 2L, "b")))
  }

  test("pointInTimeJoin: facts pick the version valid at their timestamp") {
    val dim = Scd.scd2Build(changes, "user_id", "ts", "tier", Seq("event_id"))
    val facts = Seq(
      (100L, 1L, ts("2025-12-31 00:00:00")), // before any version
      (101L, 1L, ts("2026-01-02 12:00:00")), // inside version 1 (gold)
      (102L, 1L, ts("2026-01-03 00:00:00")), // AT version 2's start → silver
      (103L, 1L, ts("2026-01-09 00:00:00")), // open current version → gold
      (104L, 2L, ts("2026-01-06 00:00:00"))
    ).toDF("fact_id", "user_id", "fts")
    val out = Scd.pointInTimeJoin(facts, dim, "user_id", "fts", "tier")
      .orderBy("fact_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4))))
    assert(out(0) == ((100L, None, None)), "pre-history fact keeps null attribution")
    assert(out(1) == ((101L, Some(1L), Some("gold"))))
    assert(out(2) == ((102L, Some(2L), Some("silver"))),
      "half-open intervals: a fact AT a boundary belongs to the newer version")
    assert(out(3) == ((103L, Some(3L), Some("gold"))))
    assert(out(4) == ((104L, Some(1L), Some("bronze"))))
  }
}
