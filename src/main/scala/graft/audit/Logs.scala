package graft.audit

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Observability subsystem — Spark-native form of the reference's `logs/`
  * package: process audit, error logging with retry/backoff, performance
  * metrics, configuration audit, lineage edge tracking
  * (`logs/audit_logger.py`, `logs/error_handler.py`,
  * `logs/performance_monitor.py`, `logs/data_lineage.py`;
  * ORM schemas `models/logs_models.py:58-305`).
  *
  * Mutation strategy (SURVEY §7.5-1): PostgreSQL UPDATEs (end_process,
  * mark_error_resolved) become an append-only event log; the "current" state
  * is a latest-wins view (`row_number` dedup by id on the event sequence).
  * Frequent tiny audit updates therefore never rewrite the table — at scale
  * an append of one row beats rewriting a 100 TB log.
  */
final case class ProcessLog(
    log_id: Long,
    process_name: String,
    process_description: String,
    start_time: Timestamp,
    end_time: Option[Timestamp],
    status: String, // RUNNING | SUCCESS | FAILED | CANCELLED
    rows_processed: Option[Long],
    rows_inserted: Option[Long],
    rows_updated: Option[Long],
    rows_deleted: Option[Long],
    source_system: Option[String],
    target_layer: Option[String],
    error_message: Option[String],
    created_by: String)

final case class ErrorLog(
    error_id: Long,
    process_log_id: Option[Long],
    error_timestamp: Timestamp,
    error_level: String, // DEBUG..CRITICAL
    error_code: String,
    error_message: String,
    error_detail: Option[String],
    table_name: Option[String],
    recovery_suggestion: Option[String],
    is_resolved: Boolean,
    resolved_by: Option[String],
    resolved_timestamp: Option[Timestamp])

final case class DataLineageEdge(
    lineage_id: Long,
    process_log_id: Option[Long],
    source_schema: String,
    source_table: String,
    target_schema: String,
    target_table: String,
    transformation_logic: Option[String],
    record_count: Option[Long],
    created_timestamp: Timestamp)

final case class PerformanceMetric(
    metric_id: Long,
    process_log_id: Option[Long],
    metric_name: String,
    metric_value: Double,
    metric_unit: String,
    measurement_timestamp: Timestamp)

final case class ConfigurationLog(
    config_log_id: Long,
    config_key: String,
    old_value: Option[String],
    new_value: String,
    change_reason: Option[String],
    changed_by: String,
    change_timestamp: Timestamp,
    environment: String)

/** Injectable clock (SURVEY §7.5-5: deterministic tests need stable times). */
trait Clock { def now(): Timestamp }
object SystemClock extends Clock {
  def now(): Timestamp = new Timestamp(System.currentTimeMillis())
}

/** Append-only parquet store per log table with a latest-wins current view.
  * Id assignment is max-existing+1 — single-writer, as the reference's DB
  * sequences effectively are (SURVEY §7.5-4).
  */
final class LogStore(val spark: SparkSession, dir: String) {
  import spark.implicits._

  private def path(table: String) = s"$dir/logs/$table"
  // One counter PER TABLE, seeded lazily from that table's persisted max so
  // a new LogStore over an existing event log keeps each table's sequence
  // monotonic: without this, an update appended after a restart would sort
  // BELOW older events and the latest-wins current() view would silently
  // return stale state. A single shared counter is not enough — it would
  // seed from whichever table is appended first and could still hand other
  // tables values below their own persisted max. computeIfAbsent also makes
  // the seed read run once per table, not once per append.
  private val seqs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private def seqFor(table: String): java.util.concurrent.atomic.AtomicLong = {
    // the seed read is a Spark job — run it OUTSIDE computeIfAbsent so the
    // map's bin lock is never held across a distributed action (a concurrent
    // duplicate seed read is harmless: both compute the same max, one wins)
    val existing = seqs.get(table)
    if (existing != null) existing
    else {
      val start =
        if (!exists(table)) 0L
        else {
          val r = events(table).agg(max(col("_event_seq"))).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
      seqs.computeIfAbsent(table, _ => new java.util.concurrent.atomic.AtomicLong(start))
    }
  }

  def appendEvents(table: String, df: DataFrame): Unit = {
    df.withColumn("_event_seq", lit(seqFor(table).incrementAndGet()))
      .coalesce(1) // audit appends are tiny; one file per event batch
      .write.mode(SaveMode.Append).parquet(path(table))
  }

  def exists(table: String): Boolean = {
    // Hadoop FileSystem, not java.io.File: the store must behave the same on
    // HDFS/S3 as on the local filesystem (same policy as
    // Mutations.overwriteTable and PartitionedFact.mergeDelta)
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def events(table: String): DataFrame = spark.read.parquet(path(table))

  /** Latest-wins state per id. */
  def current(table: String, idCol: String): DataFrame =
    if (!exists(table)) spark.emptyDataFrame
    else
      Analytics
        .dedupLatest(events(table), Seq(col(idCol)), Seq(col("_event_seq")))
        .drop("_event_seq")

  // id allocation mirrors the _event_seq mechanism above: seed once per
  // (table, idCol) from the persisted max, then count in memory — id
  // allocation must not launch a max-scan Spark job per call (5 call sites,
  // one per log table; the scan cost grows with the log, the counter doesn't)
  private val ids =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def nextId(table: String, idCol: String): Long = {
    val key = table + ":" + idCol
    val existing = ids.get(key)
    val ctr =
      if (existing != null) existing
      else {
        // seed scan runs OUTSIDE computeIfAbsent (same reasoning as seqFor):
        // never hold the map's bin lock across a distributed action
        val start =
          if (!exists(table)) 0L
          else {
            val r = events(table).agg(max(col(idCol))).head()
            if (r.isNullAt(0)) 0L else r.getLong(0)
          }
        ids.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong(start))
      }
    ctr.incrementAndGet()
  }

  /** Typed current view (SURVEY §1.4: fixed-schema logs tables are natural
    * `Dataset[T]`s — compile-time field checks on the audit path).
    */
  def currentAs[T: org.apache.spark.sql.Encoder](
      table: String, idCol: String): org.apache.spark.sql.Dataset[T] =
    current(table, idCol).as[T]
}

/** Process lifecycle logging (reference `logs/audit_logger.py:188-399`). */
final class ProcessLogger(store: LogStore, clock: Clock = SystemClock) {
  import store.spark.implicits._
  private val table = "process_log"

  def startProcess(
      name: String,
      description: String = "",
      sourceSystem: Option[String] = None,
      targetLayer: Option[String] = None,
      createdBy: String = "system"): Long = {
    val id = store.nextId(table, "log_id")
    val row = ProcessLog(id, name, description, clock.now(), None, "RUNNING",
      None, None, None, None, sourceSystem, targetLayer, None, createdBy)
    store.appendEvents(table, Seq(row).toDF())
    id
  }

  def endProcess(
      id: Long,
      status: String,
      rowsProcessed: Option[Long] = None,
      rowsInserted: Option[Long] = None,
      rowsUpdated: Option[Long] = None,
      rowsDeleted: Option[Long] = None,
      errorMessage: Option[String] = None): Unit = {
    // same error contract as updateProcessMetrics: a stale/wrong id gets a
    // message naming it, not an opaque NoSuchElementException from head()
    val hits = store.current(table, "log_id").where(col("log_id") === id).as[ProcessLog].collect()
    require(hits.nonEmpty, s"Process log with ID $id not found")
    val cur = hits.head
    val done = cur.copy(
      end_time = Some(clock.now()),
      status = status,
      rows_processed = rowsProcessed.orElse(cur.rows_processed),
      rows_inserted = rowsInserted.orElse(cur.rows_inserted),
      rows_updated = rowsUpdated.orElse(cur.rows_updated),
      rows_deleted = rowsDeleted.orElse(cur.rows_deleted),
      error_message = errorMessage.orElse(cur.error_message))
    store.appendEvents(table, Seq(done).toDF())
  }

  /** Mid-run progress counters on a RUNNING process row
    * (audit_logger.py:277-313): appends a new event-sourced version with the
    * given counters merged in, leaving status/end_time untouched — so a
    * long-running load that later crashes still shows how far it got.
    * Throws when `id` is unknown, like the reference.
    */
  def updateProcessMetrics(
      id: Long,
      rowsProcessed: Option[Long] = None,
      rowsInserted: Option[Long] = None,
      rowsUpdated: Option[Long] = None,
      rowsDeleted: Option[Long] = None): Unit = {
    val hits = store.current(table, "log_id").where(col("log_id") === id).as[ProcessLog].collect()
    require(hits.nonEmpty, s"Process log with ID $id not found")
    val cur = hits.head
    val updated = cur.copy(
      rows_processed = rowsProcessed.orElse(cur.rows_processed),
      rows_inserted = rowsInserted.orElse(cur.rows_inserted),
      rows_updated = rowsUpdated.orElse(cur.rows_updated),
      rows_deleted = rowsDeleted.orElse(cur.rows_deleted))
    store.appendEvents(table, Seq(updated).toDF())
  }

  def activeProcesses(): DataFrame =
    store.current(table, "log_id").where(col("status") === "RUNNING")

  /** History with derived duration (audit_logger.py:331-399); `statusFilter`
    * is the reference's `status=` arg ("show me FAILED runs this week",
    * audit_logger.py:348,371).
    */
  def processHistory(
      days: Int,
      nameFilter: Option[String] = None,
      statusFilter: Option[String] = None): DataFrame = {
    val base = store.current(table, "log_id")
      .where(col("start_time") >= date_sub(current_timestamp(), days))
      .withColumn(
        "duration_seconds",
        unix_timestamp(col("end_time")) - unix_timestamp(col("start_time")))
    val named = nameFilter.fold(base)(n => base.where(col("process_name") === n))
    statusFilter.fold(named)(st => named.where(col("status") === st))
      .orderBy(col("start_time").desc)
  }
}

/** Error logging + recovery (reference `logs/error_handler.py:185-483`). */
final class ErrorLogger(store: LogStore, clock: Clock = SystemClock) {
  import store.spark.implicits._
  private val table = "error_log"

  def logError(
      level: String,
      code: String,
      message: String,
      processLogId: Option[Long] = None,
      detail: Option[String] = None,
      tableName: Option[String] = None,
      recovery: Option[String] = None): Long = {
    val id = store.nextId(table, "error_id")
    val row = ErrorLog(id, processLogId, clock.now(), level, code, message,
      detail, tableName, recovery, is_resolved = false, None, None)
    store.appendEvents(table, Seq(row).toDF())
    id
  }

  def logException(e: Throwable, processLogId: Option[Long] = None): Long =
    logError(
      "ERROR",
      e.getClass.getSimpleName,
      Option(e.getMessage).getOrElse(""),
      processLogId,
      detail = Some(e.getStackTrace.take(5).mkString("\n")))

  def markResolved(id: Long, by: String, notes: Option[String] = None): Unit = {
    val hits = store.current(table, "error_id").where(col("error_id") === id).as[ErrorLog].collect()
    require(hits.nonEmpty, s"Error log with ID $id not found")
    val cur = hits.head
    val resolved = cur.copy(
      is_resolved = true,
      resolved_by = Some(by),
      resolved_timestamp = Some(clock.now()),
      error_detail = notes.map(n => cur.error_detail.fold(n)(_ + "\n" + n)).orElse(cur.error_detail))
    store.appendEvents(table, Seq(resolved).toDF())
  }

  def unresolvedErrors(): DataFrame =
    store.current(table, "error_id").where(!col("is_resolved"))
}

/** Retry with exponential backoff, logging each attempt
  * (reference `logs/error_handler.py:408-483`).
  */
object Retry {
  def withBackoff[T](
      errors: ErrorLogger,
      maxRetries: Int = 3,
      baseDelayMs: Long = 1000,
      multiplier: Double = 2.0,
      sleeper: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    var delay = baseDelayMs.toDouble
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > maxRetries) {
            errors.logError("ERROR", "RETRY_EXHAUSTED",
              s"failed after $maxRetries retries: ${e.getMessage}")
            throw e
          }
          errors.logError("WARNING", "RETRY",
            s"attempt $attempt failed: ${e.getMessage}; retrying in ${delay.toLong} ms")
          sleeper(delay.toLong)
          delay *= multiplier
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Performance metrics + timing (reference `logs/performance_monitor.py`). */
final class PerformanceMonitor(store: LogStore, clock: Clock = SystemClock) {
  import store.spark.implicits._
  private val table = "performance_metrics"

  def record(
      name: String,
      value: Double,
      unit: String,
      processLogId: Option[Long] = None): Unit = {
    val id = store.nextId(table, "metric_id")
    store.appendEvents(table,
      Seq(PerformanceMetric(id, processLogId, name, value, unit, clock.now())).toDF())
  }

  /** Loan-pattern timer: records `<name>_execution_time` in seconds. */
  def timed[T](name: String, processLogId: Option[Long] = None)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally record(s"${name}_execution_time", (System.nanoTime() - t0) / 1e9, "sec", processLogId)
  }

  /** Per-metric summary stats (performance_monitor.py:409-425). */
  def summary(): DataFrame =
    store.events(table)
      .groupBy(col("metric_name"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("metric_value")).as("avg_value"),
        min(col("metric_value")).as("min_value"),
        max(col("metric_value")).as("max_value"),
        stddev(col("metric_value")).as("stddev_value"))

  /** 95th-percentile bottleneck thresholds (performance_monitor.py:556-593). */
  def bottleneckThresholds(): DataFrame =
    store.events(table)
      .groupBy(col("metric_name"))
      .agg(expr("percentile(metric_value, 0.95)").as("p95"),
        expr("percentile(metric_value, 0.05)").as("p05"))

  /** Daily throughput over the process log (performance_monitor.py:470-497):
    * per-day process counts, row totals, average duration, and derived
    * rows/sec with the reference's zero-duration guard.
    */
  def dailyThroughput(processes: DataFrame): DataFrame =
    processes
      .where(col("end_time").isNotNull)
      .groupBy(to_date(col("start_time")).as("run_date"))
      .agg(
        count(lit(1)).as("n_processes"),
        sum(col("rows_processed")).as("total_rows"),
        avg(col("rows_processed")).as("avg_rows"),
        avg(unix_timestamp(col("end_time")) - unix_timestamp(col("start_time")))
          .as("avg_duration_sec"))
      .withColumn(
        "rows_per_second",
        when(col("avg_duration_sec") > 0,
          col("total_rows").cast("double") / (col("avg_duration_sec") * col("n_processes")))
          .otherwise(0.0))
      .orderBy(col("run_date"))
}

/** Configuration-change audit (reference `logs/audit_logger.py:473-569`). */
final class ConfigurationLogger(store: LogStore, clock: Clock = SystemClock) {
  import store.spark.implicits._
  private val table = "configuration_log"

  def logChange(
      key: String,
      oldValue: Option[String],
      newValue: String,
      reason: Option[String] = None,
      by: String = "system",
      environment: String = "dev"): Unit = {
    val id = store.nextId(table, "config_log_id")
    store.appendEvents(table,
      Seq(ConfigurationLog(id, key, oldValue, newValue, reason, by, clock.now(), environment)).toDF())
  }

  def history(key: Option[String] = None): DataFrame = {
    val base = store.events(table).drop("_event_seq")
    key.fold(base)(k => base.where(col("config_key") === k))
      .orderBy(col("change_timestamp").desc)
  }
}

/** Error-report analytics (reference `logs/error_handler.py:560-650`):
  * error-pattern rollups with resolution-time averages, daily trend, and the
  * top-N problematic tables.
  */
final class ErrorAnalyzer(store: LogStore) {

  private def errors: DataFrame = store.current("error_log", "error_id")

  /** Per (code, level): counts, resolved counts, avg hours-to-resolve
    * (error_handler.py:587-598).
    */
  def patternSummary(): DataFrame =
    errors
      .groupBy(col("error_code"), col("error_level"))
      .agg(
        count(lit(1)).as("n_errors"),
        count(when(col("is_resolved"), 1)).as("n_resolved"),
        avg((unix_timestamp(col("resolved_timestamp")) -
          unix_timestamp(col("error_timestamp"))) / 3600.0).as("avg_hours_to_resolve"))
      .orderBy(col("n_errors").desc, col("error_code"))

  /** Daily error counts per level (error_handler.py:601-610). */
  def dailyTrend(days: Int = 30): DataFrame =
    errors
      .where(col("error_timestamp") >= date_sub(current_timestamp(), days))
      .groupBy(to_date(col("error_timestamp")).as("error_date"), col("error_level"))
      .agg(count(lit(1)).as("n_errors"))
      .orderBy(col("error_date"), col("error_level"))

  /** Top-N tables by error count (error_handler.py:613-624). */
  def topProblematicTables(n: Int = 10): DataFrame =
    errors
      .where(col("table_name").isNotNull)
      .groupBy(col("table_name"))
      .agg(
        count(lit(1)).as("n_errors"),
        countDistinct(col("error_code")).as("n_distinct_codes"))
      .orderBy(col("n_errors").desc, col("table_name"))
      .limit(n)
}

/** Batch-progress logging (reference `logs/audit_logger.py:578-693`):
  * batch id `batch_%Y%m%d_%H%M%S`, estimated batches by ceiling division,
  * per-batch progress rows carried as JSON metadata on the process log.
  */
final class BatchLogger(processes: ProcessLogger, clock: Clock = SystemClock) {

  final case class BatchRun(processLogId: Long, batchId: String, estimatedBatches: Long)

  def startBatchRun(name: String, totalRows: Long, batchSize: Long): BatchRun = {
    val batchId = "batch_" +
      new java.text.SimpleDateFormat("yyyyMMdd_HHmmss").format(clock.now())
    val estimated = (totalRows + batchSize - 1) / batchSize // ceil div, ref :648
    val pid = processes.startProcess(name, s"""{"batch_id":"$batchId","estimated_batches":$estimated}""")
    BatchRun(pid, batchId, estimated)
  }

  def completeBatchRun(run: BatchRun, rowsProcessed: Long, ok: Boolean = true): Unit =
    processes.endProcess(run.processLogId, if (ok) "SUCCESS" else "FAILED",
      rowsProcessed = Some(rowsProcessed))
}

/** Circuit breaker (reference `logs/error_handler.py:485-522` — deliberately
  * a simplified pass-through there; here: opens after `failureThreshold`
  * consecutive failures, half-opens after `resetAfterMs`).
  */
final class CircuitBreaker(
    failureThreshold: Int = 5,
    resetAfterMs: Long = 60000,
    nowMs: () => Long = System.currentTimeMillis) {
  private var failures = 0
  private var openedAt: Option[Long] = None

  def state: String =
    openedAt match {
      case Some(t) if nowMs() - t < resetAfterMs => "OPEN"
      case Some(_) => "HALF_OPEN"
      case None => "CLOSED"
    }

  def call[T](f: => T): T = {
    if (state == "OPEN") throw new IllegalStateException("circuit open")
    try {
      val out = f
      failures = 0
      openedAt = None
      out
    } catch {
      case e: Throwable =>
        failures += 1
        if (failures >= failureThreshold) openedAt = Some(nowMs())
        throw e
    }
  }
}

/** Lineage edge recording (reference `logs/data_lineage.py:119-200`);
  * traversal lives in [[graft.lineage.Lineage]].
  */
final class LineageTracker(store: LogStore, clock: Clock = SystemClock) {
  import store.spark.implicits._
  private val table = "data_lineage"

  def recordEdge(
      sourceSchema: String,
      sourceTable: String,
      targetSchema: String,
      targetTable: String,
      processLogId: Option[Long] = None,
      logic: Option[String] = None,
      recordCount: Option[Long] = None): Unit = {
    val id = store.nextId(table, "lineage_id")
    store.appendEvents(table,
      Seq(DataLineageEdge(id, processLogId, sourceSchema, sourceTable,
        targetSchema, targetTable, logic, recordCount, clock.now())).toDF())
  }

  def edges(): DataFrame =
    store.events(table)
      .withColumn("src", concat_ws(".", col("source_schema"), col("source_table")))
      .withColumn("dst", concat_ws(".", col("target_schema"), col("target_table")))

  /** Medallion flow rollup (data_lineage.py:596-622). */
  def flowSummary(): DataFrame =
    store.events(table)
      .groupBy(col("source_schema"), col("target_schema"))
      .agg(
        count(lit(1)).as("n_edges"),
        countDistinct(col("transformation_logic")).as("n_logics"),
        max(col("created_timestamp")).as("last_activity"),
        sum(col("record_count")).as("total_records"))
}
