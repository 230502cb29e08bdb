package graft.dml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the warehouse-classic versioned
  * dimension the reference's medallion model implies but never builds: its
  * query layer exposes only latest-wins dedup (ROW_NUMBER latest-first,
  * reference common_queries.py:48-99 `order_by_latest`) and bronze stamps a
  * transient `_is_current` (reference medallion/bronze.py:106-114). SCD
  * Type 2 keeps EVERY attribute version with
  * its validity interval, so facts can join to the attribute value that
  * was true WHEN THE FACT HAPPENED — the point-in-time semantics
  * latest-wins joins silently get wrong.
  *
  * Scale shape: one window pass per stage over the change stream,
  * partitioned by the dimension key — no self-join, no interval
  * explosion. At 100 TB the change stream shuffles once on the key;
  * version intervals derive from `lag`/`lead` within each key's ordered
  * partition, and per-key state is one row of look-behind.
  */
object Scd {

  /** Build an SCD Type 2 dimension from a change stream.
    *
    * Stages (each one keyed window pass, same partitioning — Catalyst
    * plans a single Exchange):
    *   1. no-op suppression: a change whose attribute equals the previous
    *      change's attribute (per key, ordered by `(tsCol, tieBreak*)`)
    *      opens no new version — the classic SCD2 rule that keeps
    *      re-stated-but-unchanged source rows from fragmenting history;
    *   2. versioning: surviving changes become versions with
    *      `effective_from` = change ts, `effective_to` = next version's
    *      ts (null while current), `version` = 1-based per-key ordinal,
    *      `is_current` = last version flag.
    *
    * Intervals are half-open `[effective_from, effective_to)` — adjacent
    * versions tile the key's timeline exactly, which is what makes the
    * as-of formulation of [[pointInTimeJoin]] equal to the interval join.
    *
    * @param changes  change stream: one row per observed attribute state
    * @param keyCol   dimension (business) key
    * @param tsCol    change timestamp
    * @param attrCol  the tracked attribute
    * @param tieBreak extra ordering columns pinning same-timestamp changes
    */
  def scd2Build(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String,
      tieBreak: Seq[String]): DataFrame = {
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val wSeq = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val versions = changes
      .select((Seq(keyCol, tsCol, attrCol) ++ tieBreak).distinct.map(col): _*)
      // null-SAFE inequality: a change TO (or FROM) a null attribute is a
      // real transition — `=!=` would evaluate to null and swallow it
      .withColumn("_prev", lag(col(attrCol), 1).over(wSeq))
      .withColumn("_first", lag(lit(1), 1).over(wSeq).isNull)
      .where(col("_first") || !(col("_prev") <=> col(attrCol)))
    // the versioning window carries the SAME tie-break as suppression:
    // two surviving changes at one timestamp would otherwise get
    // nondeterministic version order / is_current (they still tile as a
    // zero-length [t, t) version — degenerate but deterministic)
    val wVer = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    versions
      .select(
        col(keyCol),
        row_number().over(wVer).cast("long").as("version"),
        col(attrCol),
        col(tsCol).as("effective_from"),
        lead(col(tsCol), 1).over(wVer).as("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Incremental SCD2 maintenance: fold a batch of NEW changes into an
    * existing dimension — close current versions whose attribute moved,
    * append the new versions, leave closed history untouched — without
    * rebuilding from the full change history. The daily-warehouse path
    * (the `_is_current` maintenance contract the reference's bronze layer
    * stamps per load, reference medallion/bronze.py:106-114), and the
    * dimension twin of [[Mutations.foldAdditiveAggregate]]'s
    * fold ≡ rebuild algebra: `scd2Apply(scd2Build(old), new)` equals
    * `scd2Build(old ∪ new)` EXACTLY for every delta that strictly
    * postdates its key's current version (certified, q198).
    *
    * No-op suppression crosses the batch boundary: each key's CURRENT
    * version participates in the suppression window as a pseudo-change at
    * its `effective_from`, so a delta row restating the key's current
    * attribute opens no version — and a later delta row that moves the
    * attribute still compares against the right predecessor. Version
    * ordinals continue from the key's current maximum; keys new to the
    * dimension start at 1.
    *
    * Contract: a delta that CHANGES a key already in the dimension must
    * strictly postdate that key's current `effective_from`. Late arrivals
    * belong in a rebuild — folding one in place would have to rewrite
    * closed history, which is exactly what this operator promises not to
    * touch. An EQUAL-timestamp delta that moves the attribute is rejected
    * just as loudly: its position in a rebuild depends on the originating
    * change's tie-break columns, which the dimension no longer carries, so
    * exact rebuild-equality is unknowable — only a restatement (suppressed,
    * so it changes nothing on either path) is legal at the tie. Same-ts
    * delta rows among THEMSELVES still tie-break fine: both engines order
    * them by `tieBreak`, which the delta does carry.
    *
    * Scale shape: one key-partitioned window pass over
    * (current versions ∪ delta) — both delta-day-sized at steady state,
    * NEVER the full change history — one delta-sized aggregate for the
    * close-out timestamps, and one key join against the dimension. The
    * dimension's closed versions stream through untouched.
    */
  def scd2Apply(
      dim: DataFrame,
      delta: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String,
      tieBreak: Seq[String]): DataFrame = {
    val dimCols = Seq(keyCol, "version", attrCol, "effective_from", "effective_to", "is_current")
    val tbTypes = tieBreak.map(c => delta.schema(c).dataType)
    val cur = dim.where(col("is_current"))
    // suppression input: the key's current state as a pseudo-change (sorts
    // before any delta row at its timestamp via _origin), then the delta
    val curSide = cur.select(
      Seq(col(keyCol), col("effective_from").as(tsCol),
        col(attrCol), lit(0).as("_origin")) ++
        tieBreak.zip(tbTypes).map { case (c, t) => lit(null).cast(t).as(c) }: _*)
    val deltaSide = delta.select(
      Seq(col(keyCol), col(tsCol), col(attrCol), lit(1).as("_origin")) ++
        tieBreak.map(col): _*)
    val ord = (col(tsCol) +: col("_origin") +: tieBreak.map(col)).map(_.asc)
    val wSeq = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val survivors = curSide.unionByName(deltaSide)
      .withColumn("_prev", lag(col(attrCol), 1).over(wSeq))
      .withColumn("_first", lag(lit(1), 1).over(wSeq).isNull)
      .where(col("_first") || !(col("_prev") <=> col(attrCol)))
      .where(col("_origin") === 1)
    // new versions: ordinals continue from the key's current version
    val ordNew = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val wVer = Window.partitionBy(col(keyCol)).orderBy(ordNew: _*)
    val newVers = survivors
      .select(
        col(keyCol),
        row_number().over(wVer).cast("long").as("_rn"),
        col(attrCol),
        col(tsCol).as("effective_from"),
        lead(col(tsCol), 1).over(wVer).as("effective_to"))
      .join(cur.select(col(keyCol), col("version").as("_base_ver")), Seq(keyCol), "left")
      .select(
        col(keyCol),
        (coalesce(col("_base_ver"), lit(0L)) + col("_rn")).as("version"),
        col(attrCol),
        col("effective_from"),
        col("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
    // close-out: a key with appended versions closes its current version at
    // the first new effective_from (a half-open [from, close) interval —
    // always strictly positive here: an equal-ts attribute move is rejected
    // by the guard below, so no zero-length close-out can arise on the
    // apply path)
    val closeAt = newVers.groupBy(col(keyCol))
      .agg(min(col("effective_from")).as("_close_ts"))
    // a delta that does not STRICTLY postdate its key's current version
    // violates the documented contract — the violation is visible right
    // here for free, so fail loudly instead of persisting a negative
    // interval over closed history (strictly earlier) or a version whose
    // rebuild position is unknowable (equal ts: the originating change's
    // tie-break is not in the dimension, so apply and rebuild could order
    // the two changes differently). Suppressed equal-ts restatements never
    // reach this guard — they open no version, so closeAt has no row.
    val closeTs = when(
      col("is_current") && col("_close_ts") <= col("effective_from"),
      raise_error(concat(
        lit("scd2Apply: delta does not strictly postdate the current version for key "),
        col(keyCol).cast("string"),
        lit(" (late or tied arrival — rebuild instead)"))))
      .otherwise(col("_close_ts"))
    val updated = dim.join(closeAt, Seq(keyCol), "left")
      .select(
        col(keyCol),
        col("version"),
        col(attrCol),
        col("effective_from"),
        when(col("is_current") && col("_close_ts").isNotNull, closeTs)
          .otherwise(col("effective_to")).as("effective_to"),
        (col("is_current") && col("_close_ts").isNull).as("is_current"))
    updated.select(dimCols.map(col): _*)
      .unionByName(newVers.select(dimCols.map(col): _*))
  }

  /** Point-in-time join: each fact row picks the dimension version whose
    * validity interval contains the fact timestamp.
    *
    * Implemented as a backward as-of join on `effective_from`
    * ([[graft.operators.AsOfJoin.asofJoin]]'s union+window pass — one
    * shuffle on the key, NO interval-overlap row explosion), then the
    * half-open upper bound is CHECKED rather than assumed: a fact inside
    * a complete SCD2 timeline always lands in the version whose
    * `effective_to` is after (or null), so the residual filter drops
    * nothing — but it turns a corrupted dimension (overlapping or gapped
    * intervals) into missing rows instead of silently wrong attributes.
    * Facts before the key's first version get a null version (left join
    * semantics) and are kept.
    *
    * Same-timestamp versions — [[scd2Build]] legally emits zero-length
    * `[t, t)` versions when two changes share a timestamp — are resolved
    * deterministically: the as-of pick is tie-broken by `version`
    * descending-preference (the HIGHEST version at the shared
    * `effective_from` wins), so a fact at `t` lands in the open successor
    * version, never in a zero-length one the residual filter would drop.
    *
    * @param dim output of [[scd2Build]] for the same key
    */
  def pointInTimeJoin(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String,
      factTsCol: String,
      attrCol: String): DataFrame = {
    val joined = graft.operators.AsOfJoin.asofJoin(
      facts,
      dim.withColumnRenamed("effective_from", "_dim_ts"),
      keys = Seq(keyCol),
      leftTsCol = factTsCol,
      rightTsCol = "_dim_ts",
      rightPayload = Seq("version", attrCol, "_dim_ts", "effective_to"),
      rightOrdCols = Seq("version"))
    joined
      .where(col("asof").isNull ||
        col("asof.effective_to").isNull ||
        col(factTsCol) < col("asof.effective_to"))
      .select(
        facts.columns.map(col) ++ Seq(
          col("asof.version").as("dim_version"),
          col(s"asof.$attrCol").as(attrCol),
          col("asof._dim_ts").as("effective_from"),
          col("asof.effective_to").as("effective_to")): _*)
  }
}
