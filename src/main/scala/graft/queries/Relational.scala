package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Analytics, QualityChecks, Skew}
import graft.dml.Mutations

/** Relational operator surface exercised as concrete queries over the
  * driver's TPC-H-ish tables. Each query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]] with IDENTICAL column names and types.
  *
  * Numeric determinism rules (so Spark and DuckDB hash-match bit-for-bit):
  *   - cross-row sums go through DecimalType (associative, exact) — never
  *     raw double sums, whose value depends on partition order;
  *   - decimal scales are only ever widened, never reduced (DuckDB truncates
  *     on scale-reducing casts while Spark rounds HALF_UP);
  *   - doubles appear only as the result of a fixed sequence of IEEE ops on
  *     exact inputs (e.g. exact-decimal-sum / count), which both engines
  *     evaluate identically.
  */
object Relational {

  /** Money column: exact 2-decimal working type. Width 12 keeps multi-factor
    * products inside DECIMAL(38,·) in both engines (DuckDB widens products by
    * the sum of argument widths and errors past 38).
    */
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private def factor(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  /** q01 — grouped pricing summary (reference GROUP BY surface,
    * `sql/query_builder.py:129-137` + conditional-agg patterns
    * `sql/common_queries.py:218-243`). TPC-H Q1 shape.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val qty = money(col("l_quantity"))
    val price = money(col("l_extendedprice"))
    val disc = factor(col("l_discount"))
    val tax = factor(col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("decimal(38,2)").cast("double").as("sum_qty"),
        sum(price).cast("decimal(38,2)").cast("double").as("sum_base_price"),
        sum(price * (one - disc)).cast("decimal(38,4)").cast("double").as("sum_disc_price"),
        sum(price * (one - disc) * (one + tax)).cast("decimal(38,6)").cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02 — projection / filter / multi-key sort / limit
    * (reference `select_builder`, `sql/query_builder.py:49-151`).
    * Predicates and the 4-column projection push down to the parquet scan.
    */
  def filterSortLimit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    o.where(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice"),
        to_date(col("o_orderdate")).as("order_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q03 — three-way inner join + aggregation (reference `join_builder`,
    * `sql/query_builder.py:154-187`). customer is small relative to lineitem
    * at any scale factor — broadcast it so the big fact table never shuffles
    * for the first join; AQE handles the rest.
    */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val revenue = money(col("l_extendedprice")) * (one - factor(col("l_discount")))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(revenue).cast("decimal(38,4)").cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("c_mktsegment"))
  }

  /** q04 — LEFT join preserving customers with zero orders
    * (reference LEFT JOIN, `sql/query_builder.py:163-166`).
    */
  def customerOrderSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(money(col("o_totalprice"))), lit(0).cast("decimal(12,2)"))
          .cast("decimal(38,2)").cast("double").as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  /** q05 — EXISTS as a left-semi join (reference `subquery_builder` EXISTS,
    * `sql/query_builder.py:330-358`): customers holding an open order.
    */
  def customersWithOpenOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(
        t.orders.where(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q06 — NOT EXISTS as a left-anti join (same reference site). The
    * correlated predicate is scoped to a date window ("no orders placed in
    * 1998") so the result is non-empty at every test scale factor: the
    * unscoped variant returns zero rows on TPC-H-shaped data (every
    * customer in `orders` exists in `customer`), which certifies nothing —
    * a 0=0 oracle match would pass even if the anti-join were broken. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val recent = t.orders.where(col("o_orderdate") >= to_date(lit("1998-01-01")))
    t.customer
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q07 — GROUP BY + HAVING (reference `sql/query_builder.py:129-137`). */
  def supplierVolumeHaving(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_suppkey"))
      .agg(
        sum(money(col("l_quantity"))).cast("decimal(38,2)").cast("double").as("total_qty"),
        count(lit(1)).as("n_items"))
      .where(col("total_qty") > 1000)
      .orderBy(col("l_suppkey"))
  }

  /** q08 — DISTINCT projection (reference `sql/query_builder.py:86`). */
  def distinctSegmentsByNation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** q09 — UNION ALL stacking (reference quality-check stacking,
    * `sql/common_queries.py:272-275`).
    */
  def unionOrderFlags(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val high = o
      .where(col("o_totalprice") > 250000.0)
      .select(lit("high_value").as("flag"), col("o_orderkey"))
    val urgent = o
      .where(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("flag"), col("o_orderkey"))
    high.unionByName(urgent).orderBy(col("flag"), col("o_orderkey"))
  }

  /** q10 — data-quality report (reference `sql/common_queries.py:196-294`):
    * null / duplicate / range checks, PASS/WARNING/FAIL classification,
    * single-pass conditional aggregation.
    */
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    import QualityChecks._
    val o = Tables(spark, dir).orders
    dataQuality(
      o,
      Seq(
        NullCheck("o_totalprice"),
        DuplicateCheck(Seq("o_orderkey")),
        DuplicateCheck(Seq("o_custkey", "o_orderdate")),
        RangeCheck("o_totalprice", 1000.0, 400000.0)))
  }

  /** q11 — pivot via conditional aggregation
    * (reference `sql/common_queries.py:297-341`).
    */
  def pivotPriorityByStatus(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val pivoted = Analytics.pivotTable(
      o,
      rowKeys = Seq("o_orderstatus"),
      pivotCol = "o_orderpriority",
      pivotValues = priorities,
      agg = sum(money(col("o_totalprice"))).cast("decimal(38,2)").cast("double"))
    pivoted.orderBy(col("o_orderstatus"))
  }

  /** q12 — running totals with yearly reset
    * (reference `sql/common_queries.py:344-396`).
    */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    Analytics
      .runningTotals(
        o,
        partitionBy = Seq(col("o_custkey")),
        orderBy = Seq(col("o_orderdate"), col("o_orderkey")),
        value = money(col("o_totalprice")),
        resetBy = Some("year"))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("running_total").cast("decimal(38,2)").cast("double").as("running_total"),
        col("running_avg"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  /** q13 — lag/lead period-over-period analysis
    * (reference `sql/common_queries.py:399-445`): monthly revenue per order
    * status with previous/next month, delta, percent change.
    */
  def monthlyRevenueLagLead(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val monthly = o
      .groupBy(col("o_orderstatus"), trunc(col("o_orderdate"), "month").as("month"))
      .agg(sum(money(col("o_totalprice"))).cast("decimal(38,2)").as("revenue"))
    Analytics
      .lagLead(
        monthly,
        partitionBy = Seq(col("o_orderstatus")),
        orderBy = Seq(col("month")),
        value = col("revenue"),
        periods = Seq(1))
      .select(
        col("o_orderstatus"),
        col("month"),
        col("revenue").cast("double").as("revenue"),
        col("prev_1").cast("decimal(38,2)").cast("double").as("prev_revenue"),
        col("next_1").cast("decimal(38,2)").cast("double").as("next_revenue"),
        col("delta_1").cast("decimal(38,2)").cast("double").as("revenue_delta"),
        col("pct_change_1").as("pct_change"))
      .orderBy(col("o_orderstatus"), col("month"))
  }

  /** q14 — time-series gap detection (reference
    * `sql/common_queries.py:514-580`, intended semantics per SURVEY §2.14):
    * gaps > 60 days between a customer's consecutive distinct order dates.
    */
  def orderDateGaps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val activity = o
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("activity_date"))
      .distinct()
    Analytics
      .timeSeriesGaps(
        activity,
        partitionBy = Seq(col("o_custkey")),
        dateCol = col("activity_date"),
        maxGapDays = 60)
      .select(col("o_custkey"), col("gap_start"), col("gap_end"), col("gap_days"))
      .orderBy(col("o_custkey"), col("gap_start"))
  }

  /** q15 — cohort retention (reference `sql/common_queries.py:448-511`). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    Analytics
      .cohortRetention(o, entity = col("o_custkey"), eventDate = col("o_orderdate"))
      .select(
        to_date(col("cohort_month")).as("cohort_month"),
        col("period_number"),
        col("active_entities"),
        col("cohort_size"),
        col("retention_pct"))
      .orderBy(col("cohort_month"), col("period_number"))
  }

  /** q16 — top-k (reference `ORDER BY ... DESC LIMIT 10`,
    * `logs/error_handler.py:613-624`): top 10 customers by lifetime spend.
    * TakeOrdered in Spark: no global sort, each partition keeps 10.
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("decimal(38,2)").as("total_spend"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("c_name"), col("total_spend"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)
  }

  /** q17 — dedup-latest pattern (reference `README.md:604-610`):
    * newest order per customer via ROW_NUMBER.
    */
  def latestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    Analytics
      .dedupLatest(o, keys = Seq(col("o_custkey")), orderBy = Seq(col("o_orderdate"), col("o_orderkey")))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** q18 — scalar-function surface: CASE/COALESCE/NULLIF/ROUND
    * (reference `sql/common_queries.py:286-290,433`; SURVEY §2.7).
    */
  def scalarSurface(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    o.select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000.0, "low")
          .when(col("o_totalprice") < 200000.0, "mid")
          .otherwise("high")
          .as("price_band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
        (money(col("o_totalprice")) * lit(0.05).cast("decimal(4,2)"))
          .cast("decimal(38,4)").cast("double").as("fee"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_rank"))
      .orderBy(col("o_orderkey"))
  }

  /** q19 — date-part rollup (reference EXTRACT surface,
    * `sql/common_queries.py:374-378`; SURVEY §2.7).
    */
  def dateRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    o.groupBy(
        year(col("o_orderdate")).as("order_year"),
        quarter(col("o_orderdate")).as("order_quarter"),
        month(col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("decimal(38,2)").cast("double").as("revenue"))
      .orderBy(col("order_year"), col("order_quarter"), col("order_month"))
  }

  /** q20 — exact interpolated percentiles (reference PERCENTILE_CONT,
    * `logs/performance_monitor.py:589-593`). Dyadic percentages keep the
    * interpolation arithmetic exact on integer-valued quantities.
    */
  def quantityPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q21 — merge action classification (reference `sql/dml.py:283-293`):
    * counts of INSERT vs UPDATE rows for a simulated source batch.
    */
  def mergeClassification(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val source = c.where(col("c_custkey") % 3 === 0)
    val target = c.where(col("c_custkey") % 2 === 0)
    Mutations
      .classifyMerge(source, target, Seq("c_custkey"))
      .groupBy(col("merge_action"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("merge_action"))
  }

  /** q22 — incremental watermark load (reference `sql/dml.py:340-391`). */
  def incrementalOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    Mutations
      .incrementalLoad(
        o,
        watermark = col("o_orderdate"),
        lastValue = lit("1999-06-01").cast("timestamp"),
        orderTieBreak = Seq(col("o_orderkey")),
        batchSize = 1000)
      .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("order_date"))
      .orderBy(col("order_date"), col("o_orderkey"))
  }

  /** q23 — upsert as full-outer merge (reference `sql/dml.py:96-167`):
    * source batch (every 3rd customer, names upper-cased) wins over target
    * (every 2nd customer); unmatched rows of either side are kept.
    */
  def upsertCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val target = c.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val source = c.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"), col("c_mktsegment"))
    Mutations
      .upsert(target, source, Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** q46 — MERGE with a DELETE branch (reference `sql/dml.py:300-336`):
    * matched customers with negative balance are deleted, other matches
    * update (source wins), unmatched source rows insert.
    */
  def mergeWithDelete(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val target = c.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val source = c.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"), col("c_acctbal"))
    Mutations
      .merge(target, source, Seq("c_custkey"), deleteWhere = Some(col("t.c_acctbal") < 0))
      .merged
      .orderBy(col("c_custkey"))
  }

  /** q47 — upsert with the reference's optional WHERE guard
    * (`sql/dml.py:134-151`): only matched rows with negative target balance
    * take source values.
    */
  def upsertWithGuard(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val target = c.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val source = c.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"), col("c_acctbal"))
    Mutations
      .upsert(target, source, Seq("c_custkey"), updateWhere = Some(col("t.c_acctbal") < 0))
      .orderBy(col("c_custkey"))
  }

  /** q48 — ON CONFLICT DO NOTHING (reference `sql/dml.py:42-93`): incoming
    * rows whose key already exists are skipped.
    */
  def conflictSkipNewCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val incoming = c.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_name"))
    val existing = c.where(col("c_custkey") % 2 === 0)
    Mutations
      .conflictSkip(incoming, existing, Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** q49 — batch UPDATE ... SET ... WHERE (reference `sql/dml.py:206-245`):
    * double the balance of one segment, leave the rest untouched.
    */
  def batchUpdateBalances(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    Mutations
      .batchUpdate(c, Map("c_acctbal" -> (col("c_acctbal") * 2)), col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q24 — soft delete (reference `sql/dml.py:170-203`): flag customers with
    * negative balances; the table keeps all rows.
    */
  def softDeleteNegativeBalances(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    Mutations
      .softDelete(c, col("c_acctbal") < 0, deletedBy = "quality_job")
      .select(col("c_custkey"), col("c_acctbal"), col("is_deleted"))
      .orderBy(col("c_custkey"))
  }

  /** q25 — scalar broadcast share-of-total (reference CROSS JOIN percentiles,
    * `logs/performance_monitor.py:607`): segment revenue share, computed by
    * attaching the single-row grand total to every segment row via a
    * constant-key broadcast hash join ([[graft.core.ScalarJoin]] — no
    * shuffle of the aggregate side, no nested-loop operator).
    */
  def segmentRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val seg = t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(money(col("o_totalprice"))).cast("decimal(38,2)").as("segment_revenue"))
    val total = seg.agg(sum(col("segment_revenue")).cast("decimal(38,2)").as("total_revenue"))
    graft.core.ScalarJoin.withScalars(seg, total)
      .withColumn(
        "revenue_share",
        col("segment_revenue").cast("double") / col("total_revenue").cast("double"))
      .orderBy(col("c_mktsegment"))
  }

  /** q26 — the bronze row-hash contract (reference `medallion/bronze.py:255-268`):
    * order-independent SHA-256 over sorted (column=value) pairs, null → ''.
    * Exercised on string/int columns (double formatting is engine-specific).
    */
  /** q51 — constraints as data-quality assertions (reference
    * `sql/ddl.py:299-344`, SURVEY §2.9): PK / UNIQUE / NOT NULL violation
    * counts over orders and lineitem, computed distributed — one shared scan
    * for the row-level checks plus one groupBy per key set
    * ([[graft.ddl.TableSpec.constraintReport]]).
    */
  def constraintViolations(spark: SparkSession, dir: String): DataFrame = {
    import graft.ddl.TableSpec
    val t = Tables(spark, dir)
    TableSpec.constraintReport(t.orders, Seq(
      TableSpec.PrimaryKey("pk_orders", Seq("o_orderkey")),
      TableSpec.Unique("uq_orders_custkey", Seq("o_custkey")),
      TableSpec.NotNullCheck("nn_orders_orderdate", "o_orderdate")))
      .unionByName(TableSpec.constraintReport(t.lineitem, Seq(
        TableSpec.PrimaryKey("pk_lineitem", Seq("l_orderkey", "l_linenumber")))))
      .orderBy(col("constraint_name"))
  }

  def rowHashNation(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir).nation
    val cols = Seq("n_name", "n_nationkey", "n_regionkey").sorted
    val payload = concat_ws(
      "|",
      cols.map(c => concat_ws("=", lit(c), coalesce(col(c).cast("string"), lit("")))): _*)
    n.select(col("n_nationkey"), sha2(payload, 256).as("row_hash"))
      .orderBy(col("n_nationkey"))
  }

  /** q107 — per-nation supplier revenue computed through the SALTED skew
    * join ([[Skew.saltedJoin]], salt 8), certified against the PLAIN-join
    * oracle: salting must be invisible in the result — every (key, salt)
    * replica matches exactly the rows the unsalted join would, so the only
    * difference is physical (each hot key spread over 8 shuffle
    * partitions). This upgrades the salting insurance from spec-gated to
    * oracle-certified.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem.select(
      col("l_suppkey").as("s_suppkey"),
      col("l_extendedprice"),
      col("l_discount"))
    val revenue = money(col("l_extendedprice")) * (one - factor(col("l_discount")))
    Skew
      .saltedJoin(
        li,
        t.supplier.select(col("s_suppkey"), col("s_nationkey")),
        Seq("s_suppkey"),
        saltBuckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        sum(revenue).cast("decimal(38,4)").cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("s_nationkey"))
  }

  /** q108 — shuffle-key skew profile over `orders.o_custkey`
    * ([[Skew.keySkewProfile]]): the top-10 heaviest customers with their
    * order counts and ratio to the median per-customer count — the
    * diagnostic that decides between a plain join, AQE skew split, and the
    * q107 salted join.
    */
  def orderKeySkew(spark: SparkSession, dir: String): DataFrame =
    Skew.keySkewProfile(Tables(spark, dir).orders, "o_custkey", topN = 10)
}
