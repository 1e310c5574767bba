package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Hostile-input behavior: the webhook boundary is schemaless and
  * untrusted (SURVEY §1.2) — garbage must drop rows, never kill the
  * job. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def env(bodies: String*): DataFrame =
    bodies.map(b => ("ALOWARE", b, Timestamp.valueOf("2025-11-05 17:30:00")))
      .toDF("source", "body", "receivedAt")
      .selectExpr("source", "map('h','v') AS headers", "body", "receivedAt")

  test("corrupt JSON bodies drop instead of failing (permissive from_json)") {
    val out = Adapters.aloware(env(
      """not json at all""",
      """{"truncated": """,
      """[] """,
      """{"event":"outbound_call","body":{"id":1,"type":1}}"""))
    out.select("eventId").as[String].collect() shouldBe Array("ALOWARE:1")
  }

  test("wrong-typed fields null out, fallbacks still apply") {
    // id is a string of letters → null long → uuid fallback; direction
    // is a string → null int → name decides
    val weird =
      """{"event":"outbound_call","body":{"id":"abc","uuid_v4":"u-9","direction":"two"}}"""
    val r = Adapters.aloware(env(weird)).select("eventId").as[String].collect()
    r shouldBe Array("ALOWARE:u-9")
  }

  test("empty envelope batch produces empty facts and empty hints") {
    val out = IngestPipeline.run(env().limit(0),
      Seq.empty[(String, Timestamp, Long)].toDF("pk", "seenAt", "expiresAt"),
      None, nowEpochSec = 1L)
    out.facts.count() shouldBe 0
    out.agentHints.count() shouldBe 0
    out.ledgerDelta.count() shouldBe 0
  }

  test("as-of join guards: shared names and bad time types are rejected") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val rShared = Seq((1L, 5L)).toDF("k", "t")
    an[IllegalArgumentException] should be thrownBy
      graft.plans.AsOfJoin.backward(l, rShared, Seq("k" -> "k"), "t", "t")
    val rBadTime = Seq((1L, "x")).toDF("rk", "rt")
    an[IllegalArgumentException] should be thrownBy
      graft.plans.AsOfJoin.backward(l, rBadTime, Seq("k" -> "rk"), "t", "rt")
  }

  test("scoreboard of zero facts is empty, not an error") {
    val empty = Seq.empty[(String, String, java.sql.Date, String, String, String,
      Timestamp, String)].toDF("eventId", "agentId", "factDateKey", "metricId",
      "notes", "source", "receivedAt", "dedupKey")
    val shifts = Seq.empty[(String, java.sql.Date, Timestamp, Timestamp, Long)]
      .toDF("AgentID", "LocalDate", "ShiftStartLocal", "ShiftEndLocal", "ShiftHours")
    Scoreboard.scoreboard(empty, Dims.dimMetric(spark), shifts,
      org.apache.spark.sql.functions.lit(Timestamp.valueOf("2024-01-02 12:00:00")))
      .count() shouldBe 0
  }
}
