package graft.medallion

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned fact-table management with a granularity knob and an
  * idempotent per-partition merge.
  *
  * The reference RANGE-partitions facts on their creation date
  * (`sql/ddl.py:199-206`) and merges increments with per-chunk commits
  * (`sql/dml.py:248-336`). The Spark-native form is directory partitioning
  * (`year=…/month=…/day=…`) so date-bounded scans prune whole partitions,
  * plus dynamic-partition-overwrite merges that rewrite ONLY the partitions
  * an increment touches — at 100 TB a daily delta rewrites a handful of day
  * directories, never the fact table.
  *
  * Granularity trades file count against pruning selectivity: year keeps
  * file counts sane at small scale; month/day are the 100 TB settings
  * (SURVEY §7.5-1).
  */
object PartitionedFact {

  sealed trait Granularity { private[PartitionedFact] def parts: Seq[String] }
  case object Year extends Granularity { val parts = Seq("year") }
  case object Month extends Granularity { val parts = Seq("year", "month") }
  case object Day extends Granularity { val parts = Seq("year", "month", "day") }

  /** Hierarchical partition column names, coarsest first. */
  def partitionColumns(prefix: String, g: Granularity): Seq[String] =
    g.parts.map(p => s"${prefix}_$p")

  /** Derive the partition columns from `dateCol`. */
  def withPartitionColumns(
      df: DataFrame, dateCol: String, prefix: String, g: Granularity): DataFrame = {
    val d = col(dateCol)
    val derive = Map[String, Column](
      "year" -> year(d), "month" -> month(d), "day" -> dayofmonth(d))
    g.parts.foldLeft(df)((acc, p) => acc.withColumn(s"${prefix}_$p", derive(p)))
  }

  /** Full (re)build: static overwrite, partitioned by the derived columns. */
  def overwrite(
      df: DataFrame, dateCol: String, prefix: String, g: Granularity, path: String): Unit =
    withPartitionColumns(df, dateCol, prefix, g)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionColumns(prefix, g): _*)
      .parquet(path)

  /** Idempotent per-partition INSERT OVERWRITE merge (upsert-by-key within
    * the partitions the delta touches):
    *
    *   1. the affected partition set is the delta's distinct partition
    *      tuples — driver state bounded by partitions touched, never rows;
    *   2. existing rows are read ONLY from those partitions (pruned scan,
    *      asserted in PartitionedFactSpec);
    *   3. survivors = existing rows whose key the delta does not supersede
    *      (left_anti), unioned with the delta;
    *   4. dynamic partition overwrite rewrites exactly the affected
    *      directories; every other partition's files are untouched.
    *
    * Re-applying the same delta reproduces the same table state. The merge is
    * partition-local: a key's date (hence partition) is assumed immutable, the
    * standard contract for event-dated facts. The merged set is pinned with
    * `localCheckpoint` before the write because Spark refuses to overwrite a
    * path it is reading from — bounded by the affected partitions' size, i.e.
    * the increment scale, not the table scale.
    */
  def mergeDelta(
      spark: SparkSession,
      path: String,
      delta: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      prefix: String,
      g: Granularity): Unit = {
    val parts = partitionColumns(prefix, g)
    val keyed = withPartitionColumns(delta, dateCol, prefix, g)
    // resolve through the Hadoop FileSystem (like Mutations.overwriteTable) so
    // the existence check holds on HDFS/S3, not just the local filesystem
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hadoopPath)) {
      keyed.write.mode(SaveMode.ErrorIfExists).partitionBy(parts: _*).parquet(path)
      return
    }
    val affected = keyed.select(parts.map(col): _*).distinct().collect()
    if (affected.isEmpty) return // routine no-data increment — nothing to merge
    // null-safe equality: a NULL dateCol lands in the null
    // (__HIVE_DEFAULT_PARTITION__) partition, which dynamic overwrite WILL
    // rewrite — a `===` filter would read no survivors from it and silently
    // drop previously stored null-dated rows
    val partitionFilter = affected.map { r =>
      parts.zipWithIndex.map { case (p, i) => col(p) <=> lit(r.get(i)) }.reduce(_ && _)
    }.reduce(_ || _)
    val existing = spark.read.parquet(path).where(partitionFilter)
    val survivors = existing.join(
      keyed.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val merged = survivors
      .unionByName(keyed.select(survivors.columns.map(col): _*))
      .localCheckpoint()

    // dynamic overwrite as a per-WRITE option (overrides the session conf) —
    // scoped to this write, invisible to concurrent writers on the session
    merged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(parts: _*)
      .parquet(path)
    // the session-wide file-status cache still lists the replaced files
    spark.catalog.refreshByPath(path)
  }
}
