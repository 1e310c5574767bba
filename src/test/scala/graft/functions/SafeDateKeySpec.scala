package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SafeDateKeySpec extends SparkSpec {
  import spark.implicits._

  private def key(ts: String, tz: String): String =
    Seq(Timestamp.valueOf(ts)).toDF("ts")
      .select(call_function("graft_date_key", $"ts", lit(tz)).as("k"))
      .as[String].head()

  test("converts UTC instants to the zone's local date") {
    key("2025-11-06 01:30:00", "America/New_York") shouldBe "2025-11-05"
    key("2025-11-06 01:30:00", "UTC") shouldBe "2025-11-06"
    key("2025-11-05 23:30:00", "Asia/Tokyo") shouldBe "2025-11-06"
  }

  test("invalid zone ids fall back to UTC instead of erroring") {
    key("2025-11-06 01:30:00", "Not/AZone") shouldBe "2025-11-06"
    key("2025-11-06 01:30:00", "") shouldBe "2025-11-06"
  }

  test("survives codegen over many rows (expression, not UDF)") {
    val n = 1000
    val out = spark.range(n)
      .select(timestamp_seconds($"id" * 86400).as("ts"))
      .select(call_function("graft_date_key", $"ts", lit("America/Chicago")).as("k"))
      .distinct().count()
    out shouldBe n // one distinct local date per day step
  }

  test("usable from SQL via extension registration") {
    spark.sql(
      "SELECT graft_date_key(TIMESTAMP '2025-11-06 01:30:00', 'America/New_York') AS k")
      .as[String].head() shouldBe "2025-11-05"
  }
}
