package graft.dml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0)
  ).toDF("id", "name", "score")

  private def source = Seq(
    (2L, "BOB", 25.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "score")

  test("upsert: source wins on match, both sides' unmatched rows survive") {
    val out = Mutations.upsert(target, source, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "alice", 10.0), (2L, "BOB", 25.0), (3L, "carol", 30.0)))
  }

  test("upsert is idempotent") {
    val once = Mutations.upsert(target, source, Seq("id"))
    val twice = Mutations.upsert(once, source, Seq("id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("conflictSkip keeps only new keys") {
    val out = Mutations.conflictSkip(source, target, Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("merge counts classify INSERT vs UPDATE") {
    val counts = Mutations.merge(target, source, Seq("id")).counts
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("INSERT" -> 1L, "UPDATE" -> 1L))
  }

  test("softDelete flags matching rows and keeps the rest") {
    val out = Mutations.softDelete(target, col("score") > 15.0, "tester")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("batchUpdate rewrites only rows matching the predicate") {
    val out = Mutations
      .batchUpdate(target, Map("score" -> (col("score") * 2)), col("id") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 20.0, 2L -> 20.0))
  }

  test("incrementalLoad applies watermark, order, and batch cap") {
    val src = (1 to 100).map(i => (i.toLong, i % 7)).toDF("seq", "v")
    val out = Mutations
      .incrementalLoad(src, col("seq"), lit(40L), Seq(col("v")), batchSize = 10)
      .select("seq").as[Long].collect()
    assert(out.length == 10 && out.forall(_ > 40) && out.sameElements(out.sorted))
  }

  test("overwriteTable swaps atomically and is re-readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-overwrite").toString
    val path = s"$dir/t"
    Mutations.overwriteTable(spark, target, path)
    assert(spark.read.parquet(path).count() == 2)
    Mutations.overwriteTable(spark, Mutations.upsert(target, source, Seq("id")), path)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("overwriteTable refuses to run over a leftover __old backup") {
    val dir = java.nio.file.Files.createTempDirectory("graft-overwrite-old").toString
    val path = s"$dir/t"
    Mutations.overwriteTable(spark, target, path)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(path + "__old"))
    val e = intercept[IllegalStateException] {
      Mutations.overwriteTable(spark, source, path)
    }
    assert(e.getMessage.contains("__old"))
    // the live table is untouched
    assert(spark.read.parquet(path).count() == 2)
  }

  private def auditedTarget = Seq(
    (1L, "alice", 10.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "loader"),
    (2L, "bob", 20.0, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "loader")
  ).toDF("id", "name", "score", "updated_at", "updated_by")

  test("upsert refreshes updated_at/updated_by on matched rows only (dml.py:118-133)") {
    val src = Seq((2L, "BOB", 25.0)).toDF("id", "name", "score")
    val out = Mutations.upsert(auditedTarget, src, Seq("id"), updatedBy = Some("merger"))
      .collect().map(r => r.getLong(0) -> ((r.getTimestamp(3), r.getString(4)))).toMap
    assert(out(1L) == (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "loader"),
      "untouched row keeps its audit columns")
    assert(out(2L)._1.after(java.sql.Timestamp.valueOf("2020-01-02 00:00:00")),
      "matched row's updated_at is refreshed")
    assert(out(2L)._2 == "merger", "matched row's updated_by is refreshed")
  }

  test("upsert WHERE guard restricts which matched rows update (dml.py:134-151)") {
    val src = Seq((1L, "ALICE", 11.0), (2L, "BOB", 25.0)).toDF("id", "name", "score")
    val out = Mutations
      .upsert(target, src, Seq("id"), updateWhere = Some(col("t.score") >= 15.0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "alice", 2L -> "BOB"),
      "only the matched row satisfying the guard takes source values")
  }

  test("merge DELETE branch removes matched rows and counts all three actions (dml.py:300-336)") {
    val res = Mutations.merge(
      target, source, Seq("id"),
      deleteWhere = Some(col("t.score") >= 20.0))
    // matched row id=2 (t.score=20) deletes; id=3 inserts; no updates remain
    val merged = res.merged.collect().map(_.getLong(0)).toSet
    assert(merged == Set(1L, 3L), s"row 2 deleted, got $merged")
    val counts = res.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("INSERT" -> 1L, "DELETE" -> 1L))
  }

  test("merge delete precedence: a row matching the delete guard is not also updated") {
    val res = Mutations.merge(target, source, Seq("id"), deleteWhere = Some(lit(true)))
    val counts = res.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("INSERT" -> 1L, "DELETE" -> 1L))
    assert(res.merged.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("batchUpdate refreshes metadata columns alongside the SET map (dml.py:226-239)") {
    val out = Mutations
      .batchUpdate(auditedTarget, Map("score" -> (col("score") * 2)), col("id") === 1,
        updatedBy = Some("batch_job"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(4)))).toMap
    assert(out(1L) == (20.0, "batch_job"), "affected row: SET applied + updated_by refreshed")
    assert(out(2L) == (20.0, "loader"), "unaffected row keeps metadata")
  }

  test("batchUpdate predicate referencing a SET column still refreshes metadata") {
    // SET name WHERE name = 'alice': the predicate must be evaluated against
    // the input row, not the rewritten one, or the refresh skips exactly the
    // rows just updated
    val out = Mutations
      .batchUpdate(auditedTarget, Map("name" -> lit("archived")), col("name") === "alice",
        updatedBy = Some("batch_job"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(4)))).toMap
    assert(out(1L) == (("archived", "batch_job")),
      "updated row gets both the SET value and the metadata refresh")
    assert(out(2L) == (("bob", "loader")), "other rows untouched")
  }

  test("upsert: NULL-keyed source row inserts with its own values, not a null husk") {
    // regression: existence was once classified by keys.head nullability, so a
    // NULL-keyed source row degraded into an all-target-null garbage row
    val tgt = Seq((Some(1L), "alice", 10.0)).toDF("id", "name", "score")
    val src = Seq((Option.empty[Long], "ghost", 99.0), (Some(1L), "ALICE", 11.0))
      .toDF("id", "name", "score")
    val out = Mutations.upsert(tgt, src, Seq("id"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out == Set((-1L, "ghost", 99.0), (1L, "ALICE", 11.0)),
      s"NULL-keyed source row must carry source values, got $out")
  }

  test("upsert: NULL-keyed target row passes through unchanged") {
    val tgt = Seq((Option.empty[Long], "orphan", 5.0), (Some(1L), "alice", 10.0))
      .toDF("id", "name", "score")
    val src = Seq((Some(2L), "carol", 30.0)).toDF("id", "name", "score")
    val out = Mutations.upsert(tgt, src, Seq("id"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(out == Set((-1L, "orphan", 5.0), (1L, "alice", 10.0), (2L, "carol", 30.0)))
  }

  test("merge: NULL-keyed source row is an INSERT with source values and is counted") {
    val tgt = Seq((Some(1L), "alice", 10.0)).toDF("id", "name", "score")
    val src = Seq((Option.empty[Long], "ghost", 99.0)).toDF("id", "name", "score")
    val res = Mutations.merge(tgt, src, Seq("id"))
    val rows = res.merged
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(rows == Set((-1L, "ghost", 99.0), (1L, "alice", 10.0)),
      s"NULL-keyed source row must insert with source values, got $rows")
    val counts = res.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("INSERT" -> 1L), s"NULL-keyed insert must be counted, got $counts")
  }

  test("merge: NULL-keyed target row is KEEP — surviving, uncounted, undeleted") {
    val tgt = Seq((Option.empty[Long], "orphan", 5.0), (Some(1L), "alice", 10.0))
      .toDF("id", "name", "score")
    val src = Seq((Some(1L), "ALICE", 11.0)).toDF("id", "name", "score")
    val res = Mutations.merge(tgt, src, Seq("id"), deleteWhere = Some(col("t.score") < 100.0))
    val rows = res.merged
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .toSet
    // id=1 matches and deletes; the NULL-keyed target row never matches, so the
    // delete guard cannot touch it
    assert(rows == Set((-1L, "orphan")))
    val counts = res.counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("DELETE" -> 1L))
  }

  test("upsert and merge reject reserved tag/action column names") {
    val bad = target.withColumn("_t_exists", lit(true))
    intercept[IllegalArgumentException] { Mutations.upsert(bad, source, Seq("id")) }
    intercept[IllegalArgumentException] { Mutations.merge(target, bad, Seq("id")) }
    val badAction = target.withColumn("_merge_action", lit("UPDATE"))
    intercept[IllegalArgumentException] { Mutations.merge(badAction, source, Seq("id")) }
  }

  test("softDelete predicate referencing is_deleted targets the input state") {
    val once = Mutations.softDelete(target, col("score") > 15.0, "t1")
    // second pass deletes rows NOT yet deleted — the predicate reads the
    // pre-rewrite is_deleted value
    val twice = Mutations.softDelete(once, !col("is_deleted"), "t2")
    val flags = twice.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(flags == Map(1L -> true, 2L -> true))
  }

  test("foldAdditiveAggregate: fold(agg(base), agg(delta)) == agg(base ++ delta)") {
    import spark.implicits._
    val base = Seq((1L, "A", 10.0), (1L, "A", 5.0), (2L, "B", 7.0)).toDF("k", "s", "v")
    val delta = Seq((1L, "A", 2.0), (3L, "C", 4.0)).toDF("k", "s", "v")
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("k", "s")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(12,2)")).as("amt"))
    val folded = Mutations.foldAdditiveAggregate(
        agg(base), agg(delta), keys = Seq("k", "s"), measureCols = Seq("n", "amt"))
      .select(col("k"), col("s"), col("n"), col("amt").cast("decimal(12,2)").as("amt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    val rebuilt = agg(base.unionByName(delta))
      .select(col("k"), col("s"), col("n"), col("amt").cast("decimal(12,2)").as("amt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    assert(folded == rebuilt, s"fold must equal rebuild exactly: $folded vs $rebuilt")
    assert(rebuilt.exists(_._1 == 3L), "delta-only keys appear")
    assert(rebuilt.exists(t => t._1 == 1L && t._3 == 3L), "shared keys merge counts")
  }

  test("foldAdditiveAggregate: schema stays fixed across folds; overflow fails loudly") {
    import spark.implicits._
    // the DECLARED state schema is decimal(6,2) — sum() widens internally,
    // the fold must narrow back (or refuse loudly)
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(6,2)")).cast("decimal(6,2)").as("amt"))
    val base = agg(Seq((1L, 10.0)).toDF("k", "v"))
    val d1 = agg(Seq((1L, 5.0)).toDF("k", "v"))
    val once = Mutations.foldAdditiveAggregate(base, d1, Seq("k"), Seq("amt"))
    assert(once.schema("amt").dataType == base.schema("amt").dataType,
      "the persisted state schema must not widen per refresh cycle")
    val twice = Mutations.foldAdditiveAggregate(once, d1, Seq("k"), Seq("amt"))
    assert(twice.schema("amt").dataType == base.schema("amt").dataType)
    // decimal(6,2) caps at 9999.99 — a fold that overflows the declared
    // state type must THROW, never write a silent NULL into durable state
    val big = agg(Seq((1L, 9000.0)).toDF("k", "v"))
    val boom = intercept[Exception] {
      Mutations.foldAdditiveAggregate(big, big, Seq("k"), Seq("amt")).collect()
    }
    assert(boom.getMessage.contains("overflows the state type"),
      s"expected the loud overflow guard, got: ${boom.getMessage}")
  }
}
