package graft.etl

import java.time.LocalDate

import graft.SparkSpec

class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("dimDate derives calendar attributes (P11)") {
    val d = Dims.dimDate(spark, LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 7))
    d.count() shouldBe 7
    val jan6 = d.filter($"Date" === java.sql.Date.valueOf("2024-01-06")).head()
    jan6.getAs[Long]("Year") shouldBe 2024
    jan6.getAs[Long]("Month") shouldBe 1
    jan6.getAs[String]("MonthName") shouldBe "January"
    jan6.getAs[Long]("Quarter") shouldBe 1
    jan6.getAs[Long]("DayOfWeek") shouldBe 6 // Saturday, ISO 1=Mon
    jan6.getAs[String]("DayName") shouldBe "Saturday"
    jan6.getAs[Boolean]("IsWeekend") shouldBe true
    val jan1 = d.filter($"Date" === java.sql.Date.valueOf("2024-01-01")).head()
    jan1.getAs[Long]("DayOfWeek") shouldBe 1 // Monday
    jan1.getAs[Boolean]("IsWeekend") shouldBe false
  }

  test("dimShift expands rules over the date range (K8)") {
    val rules = Seq(("a1", 9, 17), ("a2", 12, 20)).toDF("agentId", "startHour", "endHour")
    val d = Dims.dimShift(rules, LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 3))
    d.count() shouldBe 6 // 2 agents × 3 days
    val r = d.filter($"AgentID" === "a1" &&
      $"LocalDate" === java.sql.Date.valueOf("2024-01-02")).head()
    r.getAs[java.sql.Timestamp]("ShiftStartLocal").toString shouldBe "2024-01-02 09:00:00.0"
    r.getAs[java.sql.Timestamp]("ShiftEndLocal").toString shouldBe "2024-01-02 17:00:00.0"
    r.getAs[Long]("ShiftHours") shouldBe 8
  }

  test("dimAgentFromRoster applies the P9 defaults") {
    val roster = Seq((1L, "Agent One", "one@example.com"), (2L, null, null))
      .toDF("id", "name", "email")
    val d = Dims.dimAgentFromRoster(roster).orderBy("AgentID").collect()
    d(0).getAs[String]("AgentID") shouldBe "1"
    d(0).getAs[String]("AgentName") shouldBe "Agent One"
    d(1).getAs[String]("AgentName") shouldBe ""
    d(1).getAs[String]("Email") shouldBe ""
    all(d.map(_.getAs[String]("TimezoneIANA"))) shouldBe ""
    all(d.map(_.getAs[Boolean]("ActiveFlag"))) shouldBe true
  }

  // The reference's contract test (tests/dimagent-sync.test.ts):
  // call order fetch→clear→push; dry-run fetches only; zero rows
  // clears but skips push.
  private def roster(n: Int) = {
    val rows = (1 to n).map(i => (i.toLong, s"Agent $i", s"a$i@example.com"))
    rows.toDF("id", "name", "email")
  }

  test("dimagent sync calls fetch→clear→push in order (K4)") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val res = DimAgentSync.run(
      fetchRoster = () => { calls += "fetch"; roster(2) },
      clear = () => calls += "clear",
      push = df => { calls += "push"; df.count() })
    calls.toSeq shouldBe Seq("fetch", "clear", "push")
    res shouldBe DimAgentSync.Result(2, cleared = true, 2, dryRun = false)
  }

  test("dry-run fetches and reports without clearing or pushing") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val res = DimAgentSync.run(
      fetchRoster = () => { calls += "fetch"; roster(3) },
      clear = () => calls += "clear",
      push = df => { calls += "push"; df.count() },
      dryRun = true)
    calls.toSeq shouldBe Seq("fetch")
    res shouldBe DimAgentSync.Result(3, cleared = false, 0, dryRun = true)
  }

  test("zero roster rows clears the table but skips the push") {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val res = DimAgentSync.run(
      fetchRoster = () => { calls += "fetch"; roster(0) },
      clear = () => calls += "clear",
      push = df => { calls += "push"; df.count() })
    calls.toSeq shouldBe Seq("fetch", "clear")
    res shouldBe DimAgentSync.Result(0, cleared = true, 0, dryRun = false)
  }
}
