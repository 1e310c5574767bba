package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 merge: insert / change / delete / unchanged across two merge
  * days, then the as-of lookup resolves each fact to the version that
  * was live on its date. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-02-01 00:00:00")

  private def snapshot(rows: (String, String, String)*) =
    rows.toDF("AgentID", "AgentName", "TimezoneIANA")

  private val emptyDim = snapshot()
    .withColumn("validFrom", lit(null).cast("timestamp"))
    .withColumn("validTo", lit(null).cast("timestamp"))
    .withColumn("isCurrent", lit(true))
    .limit(0)

  test("bootstrap, change, delete, and unchanged all version correctly") {
    val attrs = Seq("AgentName", "TimezoneIANA")
    val day1 = Scd2.merge(emptyDim, snapshot(
      ("a1", "Ada", "America/New_York"),
      ("a2", "Bo", "UTC")), "AgentID", attrs, lit(t1))
    day1.count() shouldBe 2
    day1.filter(col("isCurrent")).count() shouldBe 2

    // day 2: a1 moves timezone (change), a2 vanishes (delete),
    // a3 appears (insert)
    val day2 = Scd2.merge(day1, snapshot(
      ("a1", "Ada", "Europe/London"),
      ("a3", "Cy", "UTC")), "AgentID", attrs, lit(t2))

    val rows = day2.select("AgentID", "TimezoneIANA", "validFrom", "validTo", "isCurrent")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    rows shouldBe Seq(
      ("a1", "America/New_York", t1, Some(t2), false), // closed version
      ("a1", "Europe/London", t2, None, true),         // new version
      ("a2", "UTC", t1, Some(t2), false),              // deleted → closed
      ("a3", "UTC", t2, None, true))                   // inserted

    // idempotence: re-merging the same snapshot changes nothing
    Scd2.merge(day2, snapshot(
      ("a1", "Ada", "Europe/London"),
      ("a3", "Cy", "UTC")), "AgentID", attrs, lit(t2))
      .count() shouldBe day2.count()
  }

  test("as-of lookup resolves each fact to the version live on its date") {
    val attrs = Seq("AgentName", "TimezoneIANA")
    val dim = Scd2.merge(
      Scd2.merge(emptyDim, snapshot(("a1", "Ada", "America/New_York")),
        "AgentID", attrs, lit(t1)),
      snapshot(("a1", "Ada", "Europe/London")), "AgentID", attrs, lit(t2))

    val facts = Seq(
      ("f1", "a1", Timestamp.valueOf("2024-01-15 12:00:00")),
      ("f2", "a1", Timestamp.valueOf("2024-02-15 12:00:00")))
      .toDF("eventId", "AgentID", "ts")
    val got = Scd2.asOfJoin(facts, dim, "AgentID", col("ts"))
      .select("eventId", "TimezoneIANA").as[(String, String)]
      .collect().sortBy(_._1)
    got shouldBe Seq(
      ("f1", "America/New_York"), // January fact → January version
      ("f2", "Europe/London"))    // February fact → February version
  }
}
