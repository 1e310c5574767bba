package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeFiltersSpec extends SparkSpec {
  import spark.implicits._

  // Wed 2024-01-17 as "today"; dates spanning 3 months around it.
  private val today = LocalDate.of(2024, 1, 17)
  private lazy val dates = (LocalDate.of(2023, 12, 1).toEpochDay to
    LocalDate.of(2024, 2, 15).toEpochDay)
    .map(d => java.sql.Date.valueOf(LocalDate.ofEpochDay(d)))
    .toDF("d")

  private def run(p: org.apache.spark.sql.Column): Seq[String] =
    dates.filter(p).orderBy("d").as[java.sql.Date].collect().map(_.toString).toSeq

  test("today / yesterday") {
    run(TimeFilters.today($"d", today)) shouldBe Seq("2024-01-17")
    run(TimeFilters.yesterday($"d", today)) shouldBe Seq("2024-01-16")
  }

  test("thisWeek is the Monday-based ISO week containing today") {
    run(TimeFilters.thisWeek($"d", today)) shouldBe
      (15 to 21).map(d => f"2024-01-$d%02d")
  }

  test("lastWeek") {
    run(TimeFilters.lastWeek($"d", today)) shouldBe
      (8 to 14).map(d => f"2024-01-$d%02d")
  }

  test("thisMonth / lastMonth") {
    run(TimeFilters.thisMonth($"d", today)) shouldBe
      (1 to 31).map(d => f"2024-01-$d%02d")
    run(TimeFilters.lastMonth($"d", today)) shouldBe
      (1 to 31).map(d => f"2023-12-$d%02d")
  }

  test("custom range is inclusive") {
    run(TimeFilters.custom($"d", LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 3))) shouldBe
      Seq("2024-02-01", "2024-02-02", "2024-02-03")
  }

  test("week boundary: a Monday's thisWeek starts on itself") {
    val mon = LocalDate.of(2024, 1, 15)
    run(TimeFilters.thisWeek($"d", mon)).head shouldBe "2024-01-15"
  }
}
