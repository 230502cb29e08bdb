package graft.ddl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ddl.TableSpec._

class TableSpecSpec extends SparkSpec {
  import spark.implicits._

  test("medallion template appends the 8 metadata columns + partition column") {
    val spec = medallionTemplate("silver", "customers",
      Seq(ColumnSpec("customer_id", LongType, nullable = false),
        ColumnSpec("customer_name", StringType)))
    val names = spec.schema.fieldNames.toSeq
    assert(names.containsSlice(Seq("created_at", "updated_at", "created_by", "updated_by",
      "source_system", "batch_id", "is_deleted", "row_hash")))
    assert(spec.partitionedBy == Seq("created_date"))
    assert(spec.indexes.length == 4)
    assert(spec.indexes.exists(_.partialWhere.contains("is_deleted = FALSE")))
  }

  test("createTable registers a partitioned parquet table with index metadata") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl_test")
    spark.sql("DROP TABLE IF EXISTS graft_ddl_test.t1")
    val spec = medallionTemplate("silver", "t1", Seq(ColumnSpec("id", LongType)))
    createTable(spark, spec, "graft_ddl_test.t1")
    assert(spark.catalog.tableExists("graft_ddl_test.t1"))
    val props = spark.sql("SHOW TBLPROPERTIES graft_ddl_test.t1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.keys.exists(_.startsWith("graft.index.")), props.toString)
    spark.sql("DROP DATABASE graft_ddl_test CASCADE")
  }

  test("withMedallionMetadata fills defaults and hashes business columns") {
    val df = withMedallionMetadata(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      createdBy = "loader", sourceSystem = Some("CRM"), batchId = Some("B1"))
    assert(df.where(col("is_deleted")).count() == 0)
    assert(df.select("row_hash").distinct().count() == 2)
    assert(df.schema("created_date").dataType == DateType)
  }

  test("constraints become violation counts") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, null)).toDF("id", "v")
    val out = checkConstraints(df, Seq(
      PrimaryKey("pk_id", Seq("id")),
      NotNullCheck("nn_v", "v")))
    assert(out == Map("pk_id" -> 1L, "nn_v" -> 1L))
  }

  test("constraintReport matches checkConstraints semantics, as a DataFrame") {
    // id=1 duplicated (1 dup group), one null id row (1 null row) -> pk = 2;
    // v has 1 null; (id,v) pairs are unique except the two (1,x) rows -> uq = 1
    val df = Seq(
      (Option(1L), Option("x")), (Option(1L), Option("x")),
      (Option(2L), None), (None, Option("z"))
    ).toDF("id", "v")
    val out = constraintReport(df, Seq(
      PrimaryKey("pk_id", Seq("id")),
      Unique("uq_id_v", Seq("id", "v")),
      NotNullCheck("nn_v", "v"),
      NotNullCheck("nn_id", "id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("pk_id" -> 2L, "uq_id_v" -> 1L, "nn_v" -> 1L, "nn_id" -> 1L))
    // empty input: all zero, never null
    val empty = constraintReport(df.limit(0), Seq(
      PrimaryKey("pk_id", Seq("id")), NotNullCheck("nn_v", "v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty == Map("pk_id" -> 0L, "nn_v" -> 0L))
  }

  test("active() applies the implicit is_deleted = FALSE convention") {
    val df = Seq((1L, false), (2L, true)).toDF("id", "is_deleted")
    assert(active(df).select("id").as[Long].collect().sameElements(Array(1L)))
    val noFlag = Seq(1L, 2L).toDF("id")
    assert(active(noFlag).count() == 2, "tables without the flag pass through")
  }
}
