package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to DataFrame builders;
  * `oracleSql` holds the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01. Column names AND value-determinism rules are documented
  * in [[graft.queries.Relational]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueBySegment(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_sort_limit" -> (Relational.filterSortLimit _),
    "q03_join_revenue_by_segment" -> (Relational.revenueBySegment _),
    "q04_left_join_customer_orders" -> (Relational.customerOrderSummary _),
    "q05_exists_open_orders" -> (Relational.customersWithOpenOrders _),
    "q06_not_exists_no_orders" -> (Relational.customersWithoutOrders _),
    "q07_having_supplier_volume" -> (Relational.supplierVolumeHaving _),
    "q08_distinct_projection" -> (Relational.distinctSegmentsByNation _),
    "q09_union_all" -> (Relational.unionOrderFlags _),
    "q10_quality_checks" -> (Relational.qualityReport _),
    "q11_pivot" -> (Relational.pivotPriorityByStatus _),
    "q12_running_totals" -> (Relational.runningCustomerSpend _),
    "q13_lag_lead" -> (Relational.monthlyRevenueLagLead _),
    "q14_time_series_gaps" -> (Relational.orderDateGaps _),
    "q15_cohort_retention" -> (Relational.cohortRetention _),
    "q16_top_k" -> (Relational.topCustomers _),
    "q17_dedup_latest" -> (Relational.latestOrderPerCustomer _),
    "q18_scalar_functions" -> (Relational.scalarSurface _),
    "q19_date_rollup" -> (Relational.dateRollup _),
    "q20_percentiles" -> (Relational.quantityPercentiles _),
    "q21_merge_classify" -> (Relational.mergeClassification _),
    "q22_incremental_load" -> (Relational.incrementalOrders _),
    "q23_upsert" -> (Relational.upsertCustomers _),
    "q24_soft_delete" -> (Relational.softDeleteNegativeBalances _),
    "q25_share_of_total" -> (Relational.segmentRevenueShare _),
    "q26_row_hash" -> (Relational.rowHashNation _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q03_join_revenue_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_left_join_customer_orders" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), CAST(0 AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q05_exists_open_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q06_not_exists_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q07_having_supplier_volume" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_qty, COUNT(*) AS n_items
        |  FROM lineitem GROUP BY l_suppkey)
        |WHERE total_qty > 1000 ORDER BY l_suppkey""".stripMargin,
    "q08_distinct_projection" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q09_union_all" ->
      """SELECT 'high_value' AS flag, o_orderkey FROM orders WHERE o_totalprice > 250000.0
        |UNION ALL
        |SELECT 'urgent' AS flag, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY flag, o_orderkey""".stripMargin,
    "q10_quality_checks" ->
      """WITH agg AS (
        |  SELECT COUNT(*) AS total_rows,
        |    COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS c_null,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS c_dup1,
        |    COUNT(*) - COUNT(DISTINCT (o_custkey, o_orderdate)) AS c_dup2,
        |    COUNT(CASE WHEN o_totalprice < 1000.0 OR o_totalprice > 400000.0 THEN 1 END) AS c_range
        |  FROM orders),
        |checks AS (
        |  SELECT 'null_check_o_totalprice' AS check_name, c_null AS issue_count, total_rows FROM agg
        |  UNION ALL SELECT 'duplicate_check_o_orderkey', c_dup1, total_rows FROM agg
        |  UNION ALL SELECT 'duplicate_check_o_custkey_o_orderdate', c_dup2, total_rows FROM agg
        |  UNION ALL SELECT 'range_check_o_totalprice', c_range, total_rows FROM agg),
        |scored AS (
        |  SELECT check_name, issue_count, total_rows,
        |    ROUND(100.0 * CAST(issue_count AS DOUBLE) / CAST(total_rows AS DOUBLE), 2) AS issue_percentage
        |  FROM checks)
        |SELECT check_name, issue_count, total_rows, issue_percentage,
        |  CASE WHEN issue_count = 0 THEN 'PASS' WHEN issue_percentage <= 5.0 THEN 'WARNING' ELSE 'FAIL' END AS check_status
        |FROM scored ORDER BY issue_percentage DESC, check_name""".stripMargin,
    "q11_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS "1-URGENT",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS "2-HIGH",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS "3-MEDIUM",
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS "4-NOT SPECIFIED",
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2)) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_running_totals" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DECIMAL(38,2)) AS running_total,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS running_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey, EXTRACT(YEAR FROM o_orderdate) ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q13_lag_lead" ->
      """WITH monthly AS (
        |  SELECT o_orderstatus, date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, month,
        |  CAST(revenue AS DECIMAL(38,2)) AS revenue,
        |  CAST(LAG(revenue, 1) OVER w AS DECIMAL(38,2)) AS prev_revenue,
        |  CAST(LEAD(revenue, 1) OVER w AS DECIMAL(38,2)) AS next_revenue,
        |  CAST(revenue - LAG(revenue, 1) OVER w AS DECIMAL(38,2)) AS revenue_delta,
        |  ROUND(100.0 * (CAST(revenue AS DOUBLE) - CAST(LAG(revenue, 1) OVER w AS DOUBLE)) / NULLIF(CAST(LAG(revenue, 1) OVER w AS DOUBLE), 0), 2) AS pct_change
        |FROM monthly WINDOW w AS (PARTITION BY o_orderstatus ORDER BY month)
        |ORDER BY o_orderstatus, month""".stripMargin,
    "q14_time_series_gaps" ->
      """WITH activity AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS activity_date FROM orders),
        |gaps AS (
        |  SELECT o_custkey, activity_date AS gap_start,
        |    LEAD(activity_date) OVER (PARTITION BY o_custkey ORDER BY activity_date) AS gap_end
        |  FROM activity)
        |SELECT o_custkey, gap_start, gap_end, date_diff('day', gap_start, gap_end) AS gap_days
        |FROM gaps WHERE date_diff('day', gap_start, gap_end) > 60
        |ORDER BY o_custkey, gap_start""".stripMargin,
    "q15_cohort_retention" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    date_trunc('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)) AS cohort_month,
        |    date_trunc('month', o_orderdate) AS activity_month
        |  FROM orders),
        |ret AS (
        |  SELECT cohort_month, CAST(date_diff('month', cohort_month, activity_month) AS INTEGER) AS period_number,
        |    COUNT(DISTINCT o_custkey) AS active_entities
        |  FROM base GROUP BY 1, 2),
        |sized AS (
        |  SELECT *, MAX(CASE WHEN period_number = 0 THEN active_entities END) OVER (PARTITION BY cohort_month) AS cohort_size
        |  FROM ret)
        |SELECT cohort_month, period_number, active_entities, cohort_size,
        |  ROUND(100.0 * CAST(active_entities AS DOUBLE) / CAST(cohort_size AS DOUBLE), 2) AS retention_pct
        |FROM sized ORDER BY cohort_month, period_number""".stripMargin,
    "q16_top_k" ->
      """SELECT o_custkey, c_name, total_spend FROM (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_spend
        |  FROM orders GROUP BY o_custkey) s
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q17_dedup_latest" ->
      """SELECT o_custkey, o_orderkey, order_date, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q18_scalar_functions" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000.0 THEN 'low' WHEN o_totalprice < 200000.0 THEN 'mid' ELSE 'high' END AS price_band,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.05 AS DECIMAL(4,2)) AS DECIMAL(38,4)) AS fee,
        |  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q19_date_rollup" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS revenue
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q20_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q21_merge_classify" ->
      """WITH source AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
        |target AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
        |SELECT merge_action, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN t.c_custkey IS NULL THEN 'INSERT' ELSE 'UPDATE' END AS merge_action
        |  FROM source s LEFT JOIN target t ON s.c_custkey = t.c_custkey)
        |GROUP BY merge_action ORDER BY merge_action""".stripMargin,
    "q22_incremental_load" ->
      """SELECT order_date, o_orderkey, o_custkey FROM (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
        |  ORDER BY o_orderdate, o_orderkey LIMIT 1000)
        |ORDER BY order_date, o_orderkey""".stripMargin,
    "q23_upsert" ->
      """WITH target AS (SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
        |source AS (SELECT c_custkey, UPPER(c_name) AS c_name, c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q24_soft_delete" ->
      """SELECT c_custkey, c_acctbal, (c_acctbal < 0) AS is_deleted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q25_share_of_total" ->
      """WITH seg AS (
        |  SELECT c_mktsegment, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS segment_revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment),
        |tot AS (SELECT CAST(SUM(segment_revenue) AS DECIMAL(38,2)) AS total_revenue FROM seg)
        |SELECT c_mktsegment, segment_revenue, total_revenue,
        |  CAST(segment_revenue AS DOUBLE) / CAST(total_revenue AS DOUBLE) AS revenue_share
        |FROM seg, tot ORDER BY c_mktsegment""".stripMargin,
    "q26_row_hash" ->
      """SELECT n_nationkey, sha256(concat_ws('|',
        |  concat_ws('=', 'n_name', COALESCE(CAST(n_name AS VARCHAR), '')),
        |  concat_ws('=', 'n_nationkey', COALESCE(CAST(n_nationkey AS VARCHAR), '')),
        |  concat_ws('=', 'n_regionkey', COALESCE(CAST(n_regionkey AS VARCHAR), '')))) AS row_hash
        |FROM nation ORDER BY n_nationkey""".stripMargin,
  )
}
