package graft.streaming

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{Dims, Replay, Scoreboard}

/** The reference's PRIMARY entrypoint (server.ts:28-75) end-to-end:
  * real webhook POSTs terminate at [[HttpEnvelopeRelay]], spool as
  * durable envelope files, stream through the shared transforms to
  * the colored scoreboard — and the result is PARITY-CHECKED against
  * [[Replay]] running the very same deliveries through the batch
  * pipeline (the S3 harness), so the HTTP deployment and the capture
  * replay provably compute the same dashboard. */
class HttpIngestE2ESpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def request(url: String, method: String,
      body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val os = conn.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val status = conn.getResponseCode
    val is = if (status < 400) conn.getInputStream else conn.getErrorStream
    val text =
      if (is == null) ""
      else try new String(is.readAllBytes(), StandardCharsets.UTF_8)
      finally is.close()
    conn.disconnect()
    (status, text)
  }

  test("webhook POST -> spool -> streaming ingest -> scoreboard, parity with Replay") {
    import spark.implicits._
    val spool = tmp("graft-http-spool"); val out = tmp("graft-http-out")
    val chk = tmp("graft-http-chk"); val capture = tmp("graft-http-capture")

    def call(id: Int, owner: Long, hhmm: String, ev: String = "outbound_call") =
      s"""{"event":"$ev","body":{"id":$id,"owner_id":$owner,""" +
        s""""created_at":"2025-11-05 $hhmm:00",""" +
        s""""contact":{"timezone":"America/New_York"}}}"""
    val deliveries = Seq(
      call(1, 10, "14:00"), call(2, 10, "15:00"), call(3, 10, "16:00"),
      call(3, 10, "16:00"),                   // duplicate id
      call(4, 10, "16:30", "outbound_text"),
      call(5, 10, "17:00", "inbound_call"))   // dropped by F1

    val relay = HttpEnvelopeRelay.start(spool.toString)
    try {
      val base = s"http://localhost:${relay.port}"

      // the reference entrypoint's route/status contract
      request(s"$base/health", "GET")._1 shouldBe 200
      request(s"$base/webhook/aloware", "GET")._1 shouldBe 404
      request(s"$base/nope", "POST", Some("{}"))._1 shouldBe 404
      request(s"$base/webhook/salesforce", "POST", Some("{}"))._1 shouldBe 400
      val (badStatus, badBody) =
        request(s"$base/webhook/aloware", "POST", Some("{not json"))
      badStatus shouldBe 500
      badBody should include("\"ok\":false")
      // an EMPTY body is ACCEPTED — the reference's
      // `raw ? JSON.parse(raw) : undefined` ternary admits it with
      // body undefined (server.ts:49); the adapters drop it later
      request(s"$base/webhook/aloware", "POST", Some(""))._1 shouldBe 200

      // the real deliveries (case-insensitive source segment)
      deliveries.foreach { d =>
        request(s"$base/webhook/Aloware", "POST", Some(d))._1 shouldBe 200
      }
      // the 6 deliveries + the accepted empty envelope spooled — the
      // malformed one must NOT leave a file behind
      Files.list(spool).filter(p =>
        !p.getFileName.toString.startsWith(".")).count() shouldBe 7
    } finally relay.close()

    // headers survive the envelope (P5's delivery-id seam)
    val spooledEnv = HttpEnvelopeRelay.spoolSource(spark, spool.toString)
    spooledEnv.schema.fieldNames shouldBe
      Array("source", "headers", "body", "receivedAt")

    val facts = StreamingIngest.transform(spooledEnv, roster = None)
    val q = StreamingIngest
      .parquetSink(facts, out.toString, chk.toString, triggerMs = 100)
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n < 4 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = try spark.read.parquet(out.toString).count()
          catch { case _: Throwable => 0L }
        if (n < 4) Thread.sleep(200)
      }
    } finally q.stop()

    val streamed = spark.read.parquet(out.toString)
    streamed.select("eventId").as[String].collect().sorted shouldBe
      Array("ALOWARE:1", "ALOWARE:2", "ALOWARE:3", "ALOWARE:4")

    // Replay leg: the SAME deliveries as a capture file through the
    // batch pipeline (S3 -> P* -> D1/D2 -> facts)
    Files.write(capture.resolve("capture-0001.json"),
      deliveries.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val ledger = Seq.empty[(String, Timestamp, Long)]
      .toDF("pk", "seenAt", "expiresAt")
    val (replayOut, summary) = Replay.run(spark, capture.toString, "ALOWARE",
      ledger, roster = None, nowEpochSec = 1800000000L)
    summary.lines shouldBe 6
    summary.processed shouldBe 4

    // scoreboard parity: byte-identical dashboards from both paths
    val day = LocalDate.of(2025, 11, 5)
    val shifts = Dims.dimShift(
      Seq(("10", 9, 17)).toDF("agentId", "startHour", "endHour"), day, day)
    val asOf = lit(Timestamp.valueOf("2025-11-05 17:00:00"))
    def board(facts: org.apache.spark.sql.DataFrame): Array[String] =
      Scoreboard.scoreboard(facts, Dims.dimMetric(spark), shifts, asOf)
        .select(col("agentId"), col("metricId"), col("n_events"),
          col("pct_goal"), col("color"))
        .collect().map(_.toString).sorted
    val httpBoard = board(streamed)
    val replayBoard = board(replayOut.facts)
    httpBoard shouldBe replayBoard
    httpBoard.length should be > 0
    httpBoard.mkString should include("CALLS")
  }

  test("relay redelivery across a consumer restart is absorbed exactly once") {
    import spark.implicits._
    // the relay's at-least-once story: a client whose 200 ack was
    // lost re-POSTs the same delivery — here AFTER the consumer
    // stopped and restarted from its checkpoint, so the dedup must
    // come from the ledger STATE resuming over the spool transport,
    // not from within-batch dedup
    val spool = tmp("graft-http-rd-spool"); val out = tmp("graft-http-rd-out")
    val chk = tmp("graft-http-rd-chk")
    def call(id: Int, hhmm: String) =
      s"""{"event":"outbound_call","body":{"id":$id,"owner_id":10,""" +
        s""""created_at":"2025-11-05 $hhmm:00"}}"""
    def run(expect: Long): Unit = {
      val facts = StreamingIngest.transform(
        HttpEnvelopeRelay.spoolSource(spark, spool.toString), roster = None)
      val q = StreamingIngest
        .parquetSink(facts, out.toString, chk.toString, triggerMs = 100)
        .start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        var n = 0L
        while (n < expect && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          n = try spark.read.parquet(out.toString).count()
            catch { case _: Throwable => 0L }
          if (n < expect) Thread.sleep(200)
        }
      } finally q.stop()
    }
    val relay = HttpEnvelopeRelay.start(spool.toString)
    try {
      val base = s"http://localhost:${relay.port}/webhook/aloware"
      request(base, "POST", Some(call(1, "14:00")))._1 shouldBe 200
      request(base, "POST", Some(call(2, "15:00")))._1 shouldBe 200
      run(expect = 2)
      // lost-ack retry of delivery 1 (a NEW spool file — the file
      // source will deliver it) plus a genuinely new delivery
      request(base, "POST", Some(call(1, "14:00")))._1 shouldBe 200
      request(base, "POST", Some(call(3, "16:00")))._1 shouldBe 200
      run(expect = 3)
    } finally relay.close()
    val ids = spark.read.parquet(out.toString)
      .select(col("eventId")).as[String].collect().sorted
    ids shouldBe Array("ALOWARE:1", "ALOWARE:2", "ALOWARE:3") // 1 exactly once
  }
}
