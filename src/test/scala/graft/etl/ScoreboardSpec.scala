package graft.etl

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScoreboardSpec extends SparkSpec {
  import spark.implicits._

  private val day = Date.valueOf("2024-01-02")

  private def facts(rows: (String, String, Int)*) =
    rows.flatMap { case (agent, metric, n) =>
      (1 to n).map(i => (s"E:$agent:$metric:$i", agent, day, metric, "", "ALOWARE",
        Timestamp.valueOf("2024-01-02 12:00:00"), s"A:$agent:$metric:$i"))
    }.toDF("eventId", "agentId", "factDateKey", "metricId", "notes",
      "source", "receivedAt", "dedupKey")

  private val shifts = Seq(
    ("a1", day, Timestamp.valueOf("2024-01-02 09:00:00"),
      Timestamp.valueOf("2024-01-02 17:00:00"), 8L)
  ).toDF("AgentID", "LocalDate", "ShiftStartLocal", "ShiftEndLocal", "ShiftHours")

  test("scoreboard computes counts, pct of goal, pace and color (A3-A5)") {
    // noon = 3/8 of the shift elapsed = 0.375 pace target
    val asOf = lit(Timestamp.valueOf("2024-01-02 12:00:00"))
    val sb = Scoreboard.scoreboard(
      facts(("a1", "CALLS", 25), ("a1", "TEXTS", 10)),
      Dims.dimMetric(spark), shifts, asOf)
      .orderBy("metricId").collect()
    val calls = sb(0)
    calls.getAs[Long]("n_events") shouldBe 25
    calls.getAs[Double]("pct_goal") shouldBe 0.5 // 25/50
    calls.getAs[Double]("shift_elapsed") shouldBe 0.375
    calls.getAs[String]("color") shouldBe "GREEN" // ahead of pace
    val texts = sb(1)
    texts.getAs[Double]("pct_goal") shouldBe (10.0 / 45) +- 1e-12
    texts.getAs[String]("color") shouldBe "RED" // 0.222 < 0.375*0.85
  }

  test("yellow band sits between pace*floor and pace") {
    val asOf = lit(Timestamp.valueOf("2024-01-02 17:00:00")) // shift over: pace=1
    val sb = Scoreboard.scoreboard(
      facts(("a1", "CALLS", 45)), // 0.9 of goal, floor 0.85 → YELLOW
      Dims.dimMetric(spark), shifts, asOf).head()
    sb.getAs[String]("color") shouldBe "YELLOW"
  }

  test("agents without a shift fall back to whole-day pace = 1") {
    val asOf = lit(Timestamp.valueOf("2024-01-02 12:00:00"))
    val sb = Scoreboard.scoreboard(
      facts(("a2", "CALLS", 50)), Dims.dimMetric(spark), shifts, asOf).head()
    sb.isNullAt(sb.fieldIndex("shift_elapsed")) shouldBe true
    sb.getAs[String]("color") shouldBe "GREEN" // 50/50 >= 1
  }

  test("zero-goal metrics produce null pct and null color") {
    val asOf = lit(Timestamp.valueOf("2024-01-02 12:00:00"))
    val sb = Scoreboard.scoreboard(
      facts(("a1", "EMAILS", 3)), Dims.dimMetric(spark), shifts, asOf).head()
    sb.isNullAt(sb.fieldIndex("pct_goal")) shouldBe true
    sb.isNullAt(sb.fieldIndex("color")) shouldBe true
  }
}
