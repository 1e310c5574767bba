package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** End-to-end §3.1 order on fixture envelopes: adapt → D1 → F3 → D2
  * → hints. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val recv = Timestamp.valueOf("2025-11-05 17:30:00")

  private def call(id: Int, owner: Long): String =
    s"""{"event":"outbound_call","body":{"id":$id,"owner_id":$owner,
       |"created_at":"2025-11-05 12:00:00"}}""".stripMargin.replace("\n", "")

  private def envelopes(bodies: (String, String)*): DataFrame =
    bodies.map { case (src, b) => (src, b, recv) }
      .toDF("source", "body", "receivedAt")
      .selectExpr("source", "map('h','v') AS headers", "body", "receivedAt")

  private val emptyLedger =
    Seq.empty[(String, Timestamp, Long)].toDF("pk", "seenAt", "expiresAt")

  private val now = 1800000000L

  test("full pipeline: dedup, gate, ledger, hints") {
    val env = envelopes(
      ("ALOWARE", call(1, 10)),          // admitted
      ("ALOWARE", call(1, 10)),          // within-batch dup → dropped
      ("ALOWARE", call(2, 99)),          // not on roster → dropped
      ("ALOWARE", call(3, 11)),          // admitted
      ("HUBSPOT", """{"id":7}"""))       // hubspot agent not rostered → dropped
    val roster = Seq((10L, "A", "a@x"), (11L, "B", "b@x")).toDF("id", "name", "email")
    val ledger = Seq(("ALOWARE:ALOWARE:3", recv, now + 9999)) // id 3 already seen, live
      .toDF("pk", "seenAt", "expiresAt")

    val out = IngestPipeline.run(envelopes = env, ledger = ledger,
      roster = Some(roster), nowEpochSec = now)
    out.facts.select("eventId").as[String].collect().sorted shouldBe
      Array("ALOWARE:1")
    out.ledgerDelta.select("pk").as[String].collect() shouldBe
      Array("ALOWARE:ALOWARE:1")
    out.agentHints.as[String].collect() shouldBe Array("10")
    out.metricHints.as[String].collect() shouldBe Array("CALLS")
    out.dateHints.as[java.sql.Date].head().toString shouldBe "2025-11-05"
  }

  test("roster fetch failure fails open: all sources pass the gate") {
    val env = envelopes(("ALOWARE", call(5, 123)), ("HUBSPOT", """{"id":8}"""))
    val out = IngestPipeline.run(env, emptyLedger, roster = None, nowEpochSec = now)
    out.facts.count() shouldBe 2
  }

  test("re-running a batch after appending the delta admits nothing (idempotent replay)") {
    val env = envelopes(("ALOWARE", call(6, 10)))
    val r1 = IngestPipeline.run(env, emptyLedger, None, now)
    r1.facts.count() shouldBe 1
    val ledger1 = emptyLedger.union(r1.ledgerDelta)
    val r2 = IngestPipeline.run(env, ledger1, None, now + 60)
    r2.facts.count() shouldBe 0
    r2.agentHints.count() shouldBe 0
  }
}
