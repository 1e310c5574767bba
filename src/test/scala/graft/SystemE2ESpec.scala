package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.etl._

/** The reference's whole story in one pass (SURVEY §3.1 + the DAX
  * layer): captured webhooks → replay → adapters → dedup → gate →
  * ledger → facts → dims → scoreboard → calendar filter. */
class SystemE2ESpec extends SparkSpec {
  import spark.implicits._

  test("webhook capture to colored scoreboard") {
    // 1. a capture directory: 3 calls + 1 text for agent 10 on
    //    2025-11-05 (NY tz), one duplicate, one inbound, one unknown
    //    agent
    val dir = Files.createTempDirectory("graft-sys")
    def call(id: Int, owner: Long, hhmm: String, ev: String = "outbound_call") =
      s"""{"event":"$ev","body":{"id":$id,"owner_id":$owner,
         |"created_at":"2025-11-05 $hhmm:00",
         |"contact":{"timezone":"America/New_York"}}}""".stripMargin.replace("\n", "")
    Files.writeString(dir.resolve("cap.json"), Seq(
      call(1, 10, "14:00"), call(2, 10, "15:00"), call(3, 10, "16:00"),
      call(3, 10, "16:00"),                   // duplicate id
      call(4, 10, "16:30", "outbound_text"),
      call(5, 10, "17:00", "inbound_call"),   // dropped by F1
      call(6, 99, "17:00")                    // not rostered
    ).mkString("", "\n", "\n"))

    // 2. replay through the pipeline
    val roster = Seq((10L, "Agent Ten", "ten@x")).toDF("id", "name", "email")
    val ledger = Seq.empty[(String, Timestamp, Long)].toDF("pk", "seenAt", "expiresAt")
    val (out, summary) = Replay.run(spark, dir.toString, "ALOWARE",
      ledger, Some(roster), nowEpochSec = 1800000000L)
    summary.processed shouldBe 4 // 3 calls + 1 text survive

    // 3. dims + scoreboard at 12:30 local (shift 09-17 → 7/16ths... use 12:00: 3/8 elapsed)
    val day = LocalDate.of(2025, 11, 5)
    val shifts = Dims.dimShift(
      Seq(("10", 9, 17)).toDF("agentId", "startHour", "endHour"), day, day)
    val sb = Scoreboard.scoreboard(out.facts, Dims.dimMetric(spark), shifts,
      lit(Timestamp.valueOf("2025-11-05 17:00:00"))) // shift done: pace = 1
    val rows = sb.collect().map(r =>
      r.getAs[String]("metricId") -> r).toMap
    rows("CALLS").getAs[Long]("n_events") shouldBe 3
    rows("CALLS").getAs[String]("color") shouldBe "RED"  // 3/50 ≪ 0.85
    rows("TEXTS").getAs[Long]("n_events") shouldBe 1

    // 4. the dashboard's Today filter (facts dated in agent-local tz)
    val today = sb.join(out.facts.select($"agentId", $"metricId", $"factDateKey").distinct(),
        Seq("agentId", "metricId", "factDateKey"))
      .filter(TimeFilters.today($"factDateKey", day))
    today.count() shouldBe 2 // CALLS + TEXTS rows for the local business day
    // and Yesterday matches nothing
    sb.filter(TimeFilters.yesterday($"factDateKey", day)).count() shouldBe 0
  }

  test("streamed ingest and batch replay produce the identical scoreboard") {
    // the flagship parity gate: the SAME capture fixture through (a)
    // the batch replay pipeline and (b) the streaming file source +
    // stateful-ledger transform must yield hash-equal facts and a
    // hash-equal colored scoreboard — the two deployments are one
    // engine, not two implementations that happen to agree today.
    val dir = Files.createTempDirectory("graft-par")
    def call(id: Int, owner: Long, hhmm: String, ev: String = "outbound_call") =
      s"""{"event":"$ev","body":{"id":$id,"owner_id":$owner,
         |"created_at":"2025-11-05 $hhmm:00",
         |"contact":{"timezone":"America/New_York"}}}""".stripMargin.replace("\n", "")
    Files.writeString(dir.resolve("cap.json"), Seq(
      call(1, 10, "14:00"), call(2, 10, "15:00"), call(3, 10, "16:00"),
      call(3, 10, "16:00"),                   // duplicate id
      call(4, 10, "16:30", "outbound_text"),
      call(5, 10, "17:00", "inbound_call"),   // dropped by F1
      call(6, 99, "17:00")                    // not rostered
    ).mkString("", "\n", "\n"))
    val roster = Seq((10L, "Agent Ten", "ten@x")).toDF("id", "name", "email")

    // (a) batch replay
    val ledger = Seq.empty[(String, Timestamp, Long)].toDF("pk", "seenAt", "expiresAt")
    val (bOut, _) = Replay.run(spark, dir.toString, "ALOWARE",
      ledger, Some(roster), nowEpochSec = 1800000000L)

    // (b) streaming ingest over the same capture
    val sOutDir = Files.createTempDirectory("graft-par-out")
    val sChk = Files.createTempDirectory("graft-par-chk")
    val facts = graft.streaming.StreamingIngest.transform(
      graft.streaming.StreamingIngest.fileSource(spark, dir.toString, "ALOWARE"),
      Some(roster))
    val q = graft.streaming.StreamingIngest
      .parquetSink(facts, sOutDir.toString, sChk.toString, triggerMs = 100)
      .start()
    try q.processAllAvailable() finally q.stop()
    val sFacts = spark.read.parquet(sOutDir.toString)

    // fact parity (receivedAt differs by construction — wall clock)
    val factCols = Seq("eventId", "agentId", "factDateKey", "metricId", "notes")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(factCols.map(col): _*).collect().map(_.toString).sorted.toSeq
    canon(sFacts) shouldBe canon(bOut.facts)

    // scoreboard parity
    val day = LocalDate.of(2025, 11, 5)
    val shifts = Dims.dimShift(
      Seq(("10", 9, 17)).toDF("agentId", "startHour", "endHour"), day, day)
    val at = lit(Timestamp.valueOf("2025-11-05 17:00:00"))
    def sbCanon(df: org.apache.spark.sql.DataFrame) =
      Scoreboard.scoreboard(df, Dims.dimMetric(spark), shifts, at)
        .collect().map(_.toString).sorted.toSeq
    sbCanon(sFacts) shouldBe sbCanon(bOut.facts)
  }
}
