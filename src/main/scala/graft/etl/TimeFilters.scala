package graft.etl

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The dashboard's calendar-range filters (SURVEY §2.9 "windows"):
  * Today / Yesterday / This Week / Last Week / This Month /
  * Last Month / Custom, resolved against a DateType column relative
  * to an injectable `today` (never the wall clock — determinism for
  * tests and reproducible backfills). Weeks are Monday-based like the
  * reference DimDate (DayOfWeek 1=Mon).
  *
  * Each filter is a plain `Column` predicate: comparisons against
  * literals, so they push down to parquet scans and prune date
  * partitions.
  */
object TimeFilters {
  private def d(x: LocalDate): Column = lit(java.sql.Date.valueOf(x))

  def today(c: Column, today: LocalDate): Column = c === d(today)
  def yesterday(c: Column, today: LocalDate): Column = c === d(today.minusDays(1))

  def thisWeek(c: Column, today: LocalDate): Column = {
    val start = today.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    c >= d(start) && c < d(start.plusDays(7))
  }

  def lastWeek(c: Column, today: LocalDate): Column = {
    val start = today.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)).minusDays(7)
    c >= d(start) && c < d(start.plusDays(7))
  }

  def thisMonth(c: Column, today: LocalDate): Column = {
    val start = today.withDayOfMonth(1)
    c >= d(start) && c < d(start.plusMonths(1))
  }

  def lastMonth(c: Column, today: LocalDate): Column = {
    val start = today.withDayOfMonth(1).minusMonths(1)
    c >= d(start) && c < d(start.plusMonths(1))
  }

  /** Inclusive custom range, the dashboard's date picker. */
  def custom(c: Column, from: LocalDate, to: LocalDate): Column =
    c >= d(from) && c <= d(to)
}
