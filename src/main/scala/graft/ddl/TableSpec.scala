package graft.ddl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DDL surface — Spark-native form of the reference's `sql/ddl.py`:
  * table specs with the standard medallion metadata block, partitioning,
  * comments, and the index/constraint declarations Spark has no engine
  * object for (indexes become recorded metadata — Catalyst statistics and
  * parquet pushdown replace them; constraints become data-quality
  * assertions, reference `sql/ddl.py:235-344`, SURVEY §2.9).
  */
object TableSpec {

  final case class ColumnSpec(
      name: String,
      dataType: DataType,
      nullable: Boolean = true,
      comment: Option[String] = None)

  /** Recorded, not executed: Spark has no indexes (ddl.py:235-297). */
  final case class IndexSpec(
      name: String,
      columns: Seq[String],
      method: String = "BTREE",
      unique: Boolean = false,
      partialWhere: Option[String] = None)

  sealed trait ConstraintSpec { def name: String }
  final case class PrimaryKey(name: String, columns: Seq[String]) extends ConstraintSpec
  final case class Unique(name: String, columns: Seq[String]) extends ConstraintSpec
  final case class NotNullCheck(name: String, column: String) extends ConstraintSpec

  final case class Spec(
      db: String,
      table: String,
      columns: Seq[ColumnSpec],
      partitionedBy: Seq[String] = Nil,
      comment: Option[String] = None,
      indexes: Seq[IndexSpec] = Nil,
      constraints: Seq[ConstraintSpec] = Nil) {
    def schema: StructType = StructType(columns.map { c =>
      val f = StructField(c.name, c.dataType, c.nullable)
      c.comment.fold(f)(f.withComment)
    })
  }

  /** The 8 standard medallion metadata columns (ddl.py:179-188). */
  val MedallionMetadata: Seq[ColumnSpec] = Seq(
    ColumnSpec("created_at", TimestampType, nullable = false, Some("row creation time")),
    ColumnSpec("updated_at", TimestampType),
    ColumnSpec("created_by", StringType, nullable = false),
    ColumnSpec("updated_by", StringType),
    ColumnSpec("source_system", StringType),
    ColumnSpec("batch_id", StringType),
    ColumnSpec("is_deleted", BooleanType, nullable = false, Some("soft-delete flag")),
    ColumnSpec("row_hash", StringType, comment = Some("sha-256 content hash")))

  /** Medallion table template (ddl.py:452-510): business columns + metadata
    * block, RANGE-partitioned by creation date (Spark: partition column
    * `created_date` derived at write), plus the 4 standard index records
    * (incl. the partial `is_deleted = FALSE` index, ddl.py:472-491).
    */
  def medallionTemplate(db: String, table: String, businessCols: Seq[ColumnSpec]): Spec =
    Spec(
      db,
      table,
      businessCols ++ MedallionMetadata :+
        ColumnSpec("created_date", DateType, nullable = false, Some("partition column")),
      partitionedBy = Seq("created_date"),
      comment = Some(s"medallion table $db.$table"),
      indexes = Seq(
        IndexSpec(s"idx_${table}_created_at", Seq("created_at")),
        IndexSpec(s"idx_${table}_batch_id", Seq("batch_id")),
        IndexSpec(s"idx_${table}_source_system", Seq("source_system")),
        IndexSpec(s"idx_${table}_active", Seq("is_deleted"),
          partialWhere = Some("is_deleted = FALSE"))))

  /** Create the table through the session catalog (empty, with schema,
    * partitioning, and comment). Indexes are recorded in table properties.
    */
  def createTable(spark: SparkSession, spec: Spec, qualifiedName: String): Unit = {
    val ddlCols = spec.schema.fields.map { f =>
      s"`${f.name}` ${f.dataType.sql}${if (!f.nullable) " NOT NULL" else ""}"
    }.mkString(", ")
    val partClause =
      if (spec.partitionedBy.nonEmpty)
        s" PARTITIONED BY (${spec.partitionedBy.mkString(", ")})" else ""
    val props = (spec.comment.map(c => s"'comment' = '$c'").toSeq ++
      spec.indexes.zipWithIndex.map { case (ix, i) =>
        s"'graft.index.$i' = '${ix.name}:${ix.columns.mkString("+")}'"
      }).mkString(", ")
    val propsClause = if (props.nonEmpty) s" TBLPROPERTIES ($props)" else ""
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $qualifiedName ($ddlCols) USING parquet$partClause$propsClause")
  }

  /** Fill the metadata block on a business DataFrame at write time
    * (defaults are applied here — parquet has no column defaults).
    */
  def withMedallionMetadata(
      df: DataFrame,
      createdBy: String = "system",
      sourceSystem: Option[String] = None,
      batchId: Option[String] = None): DataFrame = {
    val hashCols = df.columns.toSeq
    df.withColumn("created_at", current_timestamp())
      .withColumn("updated_at", lit(null).cast(TimestampType))
      .withColumn("created_by", lit(createdBy))
      .withColumn("updated_by", lit(null).cast(StringType))
      .withColumn("source_system", sourceSystem.map(lit).getOrElse(lit(null).cast(StringType)))
      .withColumn("batch_id", batchId.map(lit).getOrElse(lit(null).cast(StringType)))
      .withColumn("is_deleted", lit(false))
      .withColumn("row_hash", graft.bronze.Bronze.rowHash(hashCols))
      .withColumn("created_date", to_date(col("created_at")))
  }

  /** Constraint enforcement as data-quality assertions (Spark constraints
    * are unenforced): returns violation counts per constraint.
    */
  def checkConstraints(df: DataFrame, constraints: Seq[ConstraintSpec]): Map[String, Long] =
    constraints.map {
      case PrimaryKey(name, cols) =>
        val dups = df.groupBy(cols.map(col): _*).count().where(col("count") > 1).count()
        val nulls = df.where(cols.map(c => col(c).isNull).reduce(_ || _)).count()
        name -> (dups + nulls)
      case Unique(name, cols) =>
        name -> df.groupBy(cols.map(col): _*).count().where(col("count") > 1).count()
      case NotNullCheck(name, c) =>
        name -> df.where(col(c).isNull).count()
    }.toMap

  /** Distributed constraint report: one `(constraint_name, violations)` row
    * per constraint, as a DataFrame the caller composes/sinks — unlike
    * [[checkConstraints]] (driver-side Map, one job per constraint), this is
    * the 100 TB shape. Scan economy: ALL NotNull checks share one
    * aggregation pass; each PrimaryKey/Unique key set costs exactly one
    * groupBy — a PK's null-row count rides the same shuffle, since null-keyed
    * rows form groups too. PK violations = duplicate groups + null-key rows
    * (the [[checkConstraints]] semantics, reference `sql/ddl.py:299-344`).
    */
  def constraintReport(df: DataFrame, constraints: Seq[ConstraintSpec]): DataFrame = {
    val keyChecks: Seq[DataFrame] = constraints.collect {
      case PrimaryKey(name, cols) =>
        val anyNull = cols.map(col(_).isNull).reduce(_ || _)
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(
            sum(when(col("cnt") > 1, lit(1L)).otherwise(lit(0L)) +
              when(anyNull, col("cnt")).otherwise(lit(0L))),
            lit(0L)).as("violations"))
          .select(lit(name).as("constraint_name"), col("violations"))
      case Unique(name, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(when(col("cnt") > 1, lit(1L)).otherwise(lit(0L))), lit(0L))
            .as("violations"))
          .select(lit(name).as("constraint_name"), col("violations"))
    }
    val notNulls = constraints.collect { case NotNullCheck(name, c) => (name, c) }
    val rowChecks: Seq[DataFrame] = if (notNulls.isEmpty) Nil else {
      val aggs = notNulls.map { case (name, c) =>
        coalesce(sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))), lit(0L)).as(name)
      }
      val stackArgs = notNulls.map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
      Seq(df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${notNulls.size}, $stackArgs) AS (constraint_name, violations)"))
    }
    (keyChecks ++ rowChecks).reduce(_ unionByName _)
  }

  /** The engine-wide implicit soft-delete convention
    * (`"is_deleted" = FALSE` appended to every query,
    * query_builder.py:121-124): the API-layer accessor.
    */
  def active(df: DataFrame): DataFrame =
    if (df.columns.contains("is_deleted")) df.where(!col("is_deleted")) else df
}
