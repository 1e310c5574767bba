package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension control-plane (SURVEY §2.8 K4/K5/K8, §2.2 P9/P11).
  *
  * All dims are small; producers return DataFrames the caller
  * persists with `write.mode("overwrite")` — an atomic Type-1
  * clear-and-replace, strictly better than the reference's
  * DELETE-then-push gap (SURVEY §2.8 K4).
  */
object Dims {

  /** P11 — DimDate calendar seed over [start, end], ±5y in the
    * reference (`docs/quill_dashboard_schema_design_doc.md:105-106`).
    * Generator: `explode(sequence(...))` — no driver-side loop.
    * DayOfWeek is ISO 1=Mon..7=Sun per the reference DimDate spec. */
  def dimDate(spark: SparkSession, start: LocalDate, end: LocalDate): DataFrame = {
    spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(start)),
        lit(java.sql.Date.valueOf(end)))).as("Date"))
      .select(col("Date"),
        year(col("Date")).cast("long").as("Year"),
        month(col("Date")).cast("long").as("Month"),
        dayofmonth(col("Date")).cast("long").as("Day"),
        date_format(col("Date"), "MMMM").as("MonthName"),
        quarter(col("Date")).cast("long").as("Quarter"),
        (weekday(col("Date")) + 1).cast("long").as("DayOfWeek"),
        date_format(col("Date"), "EEEE").as("DayName"),
        (weekday(col("Date")) >= 5).as("IsWeekend"))
  }

  /** DimMetric seed — goals/floors from the design doc
    * (`docs/quill_dashboard_schema_design_doc.md:82,131-132`). */
  def dimMetric(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("CALLS", "Outbound Calls", 50L, 0.85),
      ("TEXTS", "Outbound Texts", 45L, 0.85),
      ("EMAILS", "Emails Sent", 0L, 0.85),
      ("CASES", "Cases Created", 0L, 0.85)
    ).toDF("MetricID", "MetricName", "DefaultGoal", "DefaultYellowFloorPct")
  }

  /** P9 — roster member rows → DimAgent rows (defaults per
    * `src/services/admin/dimagent.sync.service.ts:39-45`). Roster
    * schema: (id, name, email). */
  def dimAgentFromRoster(roster: DataFrame): DataFrame =
    roster.select(
      col("id").cast("string").as("AgentID"),
      coalesce(col("name"), lit("")).as("AgentName"),
      coalesce(col("email"), lit("")).as("Email"),
      lit("").as("TimezoneIANA"),
      lit(true).as("ActiveFlag"))

  /** K8 — DimShift rows from shift rules × a date range: one row per
    * (agent, local date) with local shift bounds. Rules schema:
    * (agentId, startHour, endHour). */
  def dimShift(rules: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    rules.select(col("agentId").cast("string").as("AgentID"),
        col("startHour"), col("endHour"),
        explode(sequence(
          lit(java.sql.Date.valueOf(start)),
          lit(java.sql.Date.valueOf(end)))).as("LocalDate"))
      .select(col("AgentID"), col("LocalDate"),
        atHour(col("LocalDate"), col("startHour")).as("ShiftStartLocal"),
        atHour(col("LocalDate"), col("endHour")).as("ShiftEndLocal"),
        (col("endHour") - col("startHour")).cast("long").as("ShiftHours"))

  private def atHour(day: Column, hour: Column): Column =
    timestamp_seconds(unix_timestamp(day.cast("timestamp")) + hour.cast("long") * 3600L)

  /** K5 — star-schema DDL: create the five sink tables (reference
    * `tools/pbi/create-dataset.ts:110-135`) in the session catalog.
    * Idempotent (IF NOT EXISTS). */
  def createStarTables(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ddl = Seq(
      "FactEvent" ->
        "EventID STRING, AgentID STRING, FactDateKey DATE, MetricID STRING, Notes STRING",
      "DimAgent" ->
        "AgentID STRING, AgentName STRING, Email STRING, TimezoneIANA STRING, ActiveFlag BOOLEAN",
      "DimMetric" ->
        "MetricID STRING, MetricName STRING, DefaultGoal BIGINT, DefaultYellowFloorPct DOUBLE",
      "DimDate" ->
        ("Date DATE, Year BIGINT, Month BIGINT, Day BIGINT, MonthName STRING, " +
          "Quarter BIGINT, DayOfWeek BIGINT, DayName STRING, IsWeekend BOOLEAN"),
      "DimShift" ->
        ("AgentID STRING, LocalDate DATE, ShiftStartLocal TIMESTAMP, " +
          "ShiftEndLocal TIMESTAMP, ShiftHours BIGINT"))
    ddl.foreach { case (name, cols) =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($cols) USING parquet")
    }
  }
}

/** K4 — clear-and-replace DimAgent sync with the reference's exact
  * contract (`tests/dimagent-sync.test.ts`): call order
  * fetch→clear→push, dry-run fetches only, zero rows clears but
  * skips push. Sinks are injected (the reference's
  * `DimAgentSyncDependencies` DI surface) so tests assert ordering.
  */
object DimAgentSync {
  final case class Result(fetched: Long, cleared: Boolean, inserted: Long, dryRun: Boolean)

  def run(
      fetchRoster: () => DataFrame,
      clear: () => Unit,
      push: DataFrame => Long,
      dryRun: Boolean = false): Result = {
    val rows = Dims.dimAgentFromRoster(fetchRoster())
    val n = rows.count()
    if (dryRun) return Result(n, cleared = false, 0L, dryRun = true)
    clear()
    if (n == 0) return Result(0L, cleared = true, 0L, dryRun = false)
    val inserted = push(rows)
    Result(n, cleared = true, inserted, dryRun = false)
  }
}
