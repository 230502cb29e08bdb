package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — Spark-native form of the reference's
  * `sql/common_queries.py:196-294` (null %, duplicate %, range violations,
  * PASS/WARNING/FAIL classification, stacked report).
  *
  * Every check over the same table is computed in ONE aggregation pass
  * (conditional aggregates), then unpivoted into report rows — at 100 TB this
  * is a single scan + single reduce, not one scan per check as a naive
  * UNION-of-SELECTs would be. Only duplicate checks need a second pass
  * (exact `countDistinct` per column set, as the reference semantics require
  * exact counts, not approx_count_distinct).
  */
object QualityChecks {

  sealed trait Check { def name: String }
  final case class NullCheck(column: String) extends Check {
    val name = s"null_check_$column"
  }
  final case class DuplicateCheck(columns: Seq[String]) extends Check {
    val name = s"duplicate_check_${columns.mkString("_")}"
  }
  final case class RangeCheck(column: String, lo: Double, hi: Double) extends Check {
    val name = s"range_check_$column"
  }

  /** WARNING threshold: issues ≤ 5% (reference `common_queries.py:286-290`). */
  private val WarnPct = 5.0

  /** Run all checks in one aggregation, returning rows
    * (check_name, issue_count, total_rows, issue_percentage, check_status)
    * ordered worst-first (reference orders by issue_percentage DESC).
    */
  def dataQuality(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val issueExpr: Map[String, Column] = checks.map {
      case c @ NullCheck(column) =>
        c.name -> count(when(col(column).isNull, 1))
      case c @ DuplicateCheck(columns) =>
        c.name -> (count(lit(1)) - countDistinct(col(columns.head), columns.tail.map(col): _*))
      case c @ RangeCheck(column, lo, hi) =>
        c.name -> count(when(col(column) < lo || col(column) > hi, 1))
    }.toMap

    val aggs = issueExpr.toSeq.map { case (n, e) => e.cast("long").as(n) } :+
      count(lit(1)).as("total_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)

    // Unpivot the single aggregate row into one report row per check.
    val reportRows = checks.map { c =>
      struct(
        lit(c.name).as("check_name"),
        col(c.name).as("issue_count"),
        col("total_rows").as("total_rows"))
    }
    one
      .select(explode(array(reportRows: _*)).as("r"))
      .select("r.*")
      .withColumn(
        "issue_percentage",
        round(lit(100.0) * col("issue_count").cast("double") /
          col("total_rows").cast("double"), 2))
      .withColumn(
        "check_status",
        when(col("issue_count") === 0, "PASS")
          .when(col("issue_percentage") <= WarnPct, "WARNING")
          .otherwise("FAIL"))
      .orderBy(col("issue_percentage").desc, col("check_name"))
  }
}
