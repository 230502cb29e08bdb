package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the most recent right row at-or-before, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")) // user 20 has no clicks
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.0), // equal ts -> inclusive
      (102L, 10L, ts("2024-01-01 11:00:00"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin
      .asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .select(col("event_id"), col("asof.event_id").as("match_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(1L).contains(101L), "equal timestamp matches (inclusive)")
    assert(out(2L).contains(102L), "latest earlier right row wins")
    assert(out(3L).isEmpty, "no right row -> null match")
  }

  test("asofJoin with no keys treats both sides as one global series") {
    val left = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "ts")
    val right = Seq((100L, ts("2024-01-01 11:00:00"))).toDF("event_id", "ts")
    val out = AsOfJoin.asofJoin(left, right, Seq.empty, "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isEmpty && out(2L).contains(100L))
  }

  test("asofJoin never matches right rows with null timestamps or keys") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, Some(10L), None: Option[Timestamp], 1.0), // null ts
      (101L, None: Option[Long], Some(ts("2024-01-01 09:00:00")), 2.0) // null key
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin
      .asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"))
      .select(col("asof.event_id")).collect()
    assert(out.length == 1 && out.head.isNullAt(0),
      "ts >= NULL is false and NULL keys never equal — no match")
  }

  test("asofJoin equals the naive theta-join + dedup formulation") {
    val left = (1L to 40L).map(i => (i, i % 4, ts(f"2024-01-01 ${i % 24}%02d:0${i % 6}:00")))
      .toDF("l_id", "k", "l_ts")
    val right = (1L to 60L).map(i => (1000 + i, i % 4, ts(f"2024-01-01 ${(i * 7) % 24}%02d:0${i % 10 % 6}:00")))
      .toDF("r_id", "k", "r_ts")
      // dedup equal (k, ts) for determinism, as the contract requires
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"), col("r_ts"))
          .orderBy(col("r_id").desc)))
      .where(col("rn") === 1).drop("rn")
    val fast = AsOfJoin.asofJoin(left, right, Seq("k"), "l_ts", "r_ts", Seq("r_id"))
      .select(col("l_id"), col("asof.r_id").as("r_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naive = left.join(right, Seq("k"), "left")
      .where(col("r_ts").isNull || col("r_ts") <= col("l_ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_id"))
          .orderBy(col("r_ts").desc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("l_id"), when(col("r_ts") <= col("l_ts"), col("r_id")).as("r_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast.keySet == left.select("l_id").as[Long].collect().toSet)
    fast.foreach { case (id, m) =>
      assert(m == naive.getOrElse(id, None), s"mismatch for left row $id")
    }
  }

  test("intervalJoin matches half-open containment exactly, across chunks") {
    val points = Seq((1L, 0.0), (2L, 0.99), (3L, 1.0), (4L, 49.99), (5L, 50.0), (6L, 120.0), (7L, 500.0))
      .toDF("id", "v")
    val intervals = Seq((0L, 0.0, 1.0), (1L, 1.0, 50.0), (2L, 50.0, 500.0))
      .toDF("band", "lo", "hi")
    val out = RangeJoin.intervalJoin(points, "v", intervals, "lo", "hi", chunkWidth = 10.0)
      .select("id", "band").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 2L),
      "lo inclusive, hi exclusive, wide intervals span chunks; out-of-range point drops")
  }

  test("intervalJoin never duplicates a point") {
    val points = (0 until 200).map(i => (i.toLong, i * 2.5)).toDF("id", "v")
    val intervals = Seq((0L, 0.0, 100.0), (1L, 100.0, 250.0), (2L, 250.0, 1000.0))
      .toDF("band", "lo", "hi")
    val out = RangeJoin.intervalJoin(points, "v", intervals, "lo", "hi", chunkWidth = 7.0)
    assert(out.count() == 200)
    assert(out.select("id").distinct().count() == 200)
  }

  test("asofJoinForward picks the earliest right row at-or-after, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:30:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")) // user 20 has no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0), // before every left ts
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.0), // equal ts -> inclusive
      (102L, 10L, ts("2024-01-01 11:00:00"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin
      .asofJoinForward(left, right, Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .select(col("event_id"), col("asof.event_id").as("match_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(1L).contains(101L), "equal timestamp matches (inclusive)")
    assert(out(2L).isEmpty, "no later right row -> null match (never looks back)")
    assert(out(3L).isEmpty, "no right row -> null match")
  }

  test("overlapJoin: half-open semantics, open intervals, exact bounds") {
    // left intervals per key 1: [0,10), [10,20), [30,∞)
    val left = Seq(
      (1L, 0L, Some(10L)), (1L, 10L, Some(20L)), (1L, 30L, None),
      (2L, 0L, Some(5L))
    ).toDF("k", "ls", "le")
    // right: [5,12) overlaps the first two; [20,30) touches [10,20) at 20
    // (NO overlap — half-open) and [30,∞) at 30 (no overlap either);
    // [35,40) overlaps only the open interval
    val right = Seq(
      (1L, 5L, Some(12L)), (1L, 20L, Some(30L)), (1L, 35L, Some(40L))
    ).toDF("k", "rs", "re")
    val out = RangeJoin.overlapJoin(left, right, Seq("k"), "ls", "le", "rs", "re")
      .select(col("ls"), col("rs"), col("overlap_start"), col("overlap_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (0L, 5L, 5L, 10L),    // [0,10) ∩ [5,12) = [5,10)
      (10L, 5L, 10L, 12L),  // [10,20) ∩ [5,12) = [10,12)
      (30L, 35L, 35L, 40L)  // open left ∩ [35,40) = [35,40)
    ), s"got ${out.toSeq}")
  }

  test("overlapJoin: both-open overlap has a null end; keyless refused") {
    val left = Seq((1L, 0L, Option.empty[Long])).toDF("k", "ls", "le")
    val right = Seq((1L, 5L, Option.empty[Long])).toDF("k", "rs", "re")
    val out = RangeJoin.overlapJoin(left, right, Seq("k"), "ls", "le", "rs", "re")
      .select(col("overlap_start"), col("overlap_end")).collect()
    assert(out.length == 1 && out.head.getLong(0) == 5L && out.head.isNullAt(1),
      "open ∩ open starts at the later start and stays open")
    intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(left, right, Seq.empty, "ls", "le", "rs", "re")
    }
  }

  test("asofJoinNearest: closer side wins, distance ties backward, edges null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 09:00 (1h) vs fwd 10:30 (30m) -> fwd
      (2L, 10L, ts("2024-01-01 11:30:00")), // back 10:30 (1h) vs fwd 12:30 (1h) -> TIE -> back
      (3L, 10L, ts("2024-01-01 08:00:00")), // nothing before -> forward only
      (4L, 10L, ts("2024-01-01 23:00:00")), // nothing after -> backward only
      (5L, 20L, ts("2024-01-01 10:00:00")), // user 20 has no right rows -> null
      (6L, 30L, ts("2024-01-01 10:00:00"))  // equal-ts right row -> distance 0, backward
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00")),
      (101L, 10L, ts("2024-01-01 10:30:00")),
      (102L, 10L, ts("2024-01-01 12:30:00")),
      (200L, 30L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin
      .asofJoinNearest(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof.event_id").as("mid"), col("asof_side"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))))
      .toMap
    assert(out(1L) == ((Some(101L), Some("forward"))), "closer forward row wins")
    assert(out(2L) == ((Some(101L), Some("backward"))), "exact distance tie -> backward")
    assert(out(3L) == ((Some(100L), Some("forward"))), "nothing earlier -> forward")
    assert(out(4L) == ((Some(102L), Some("backward"))), "nothing later -> backward")
    assert(out(5L) == ((None, None)), "no right rows -> null match and null side")
    assert(out(6L) == ((Some(200L), Some("backward"))), "equal ts = distance 0, backward")
  }

  test("asofJoinNearest ties at one timestamp follow each direction's convention") {
    // two right rows at 09:00 (backward candidates) and two at 11:00
    // (forward candidates); left at 10:00 is equidistant -> backward wins,
    // and the backward pick takes the GREATEST tie-break row
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00")),
      (101L, 10L, ts("2024-01-01 09:00:00")),
      (102L, 10L, ts("2024-01-01 11:00:00")),
      (103L, 10L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin
      .asofJoinNearest(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"),
        rightOrdCols = Seq("event_id"))
      .select(col("asof.event_id"), col("asof_side")).collect()
    assert(out.head.getLong(0) == 101L && out.head.getString(1) == "backward",
      "distance tie -> backward, and backward takes the greatest tie-break row")
  }

  test("a NULL left timestamp never fabricates a match (forward and nearest)") {
    // nulls sort first under the window ordering: without the guard the
    // FORWARD frame hands a null-ts left row the partition's earliest
    // right row as a "match at undefined distance" (round-14 review)
    val left = Seq(
      (1L, 10L, Option.empty[Timestamp]),
      (2L, 10L, Some(ts("2024-01-01 10:00:00")))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val fwd = AsOfJoin
      .asofJoinForward(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(fwd(1L), "null left ts -> null forward match")
    val near = AsOfJoin
      .asofJoinNearest(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof"), col("asof_side")).collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(near(1L) == ((true, true)), "null left ts -> null match AND null side")
    assert(near(2L) == ((false, false)), "real timestamps still match")
  }

  test("asofJoinForward ties: smallest rightOrdCols row at one timestamp wins") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (102L, 10L, ts("2024-01-01 11:00:00")),
      (101L, 10L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin
      .asofJoinForward(left, right, Seq("user_id"), "ts", "ts", Seq("event_id"),
        rightOrdCols = Seq("event_id"))
      .select(col("asof.event_id")).collect()
    assert(out.head.getLong(0) == 101L,
      "among equal-timestamp right rows the smallest tie-break value wins")
  }
}
