package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{Dims, Scoreboard}

/** Live-transport deployment shape (SURVEY §2.1 S1 over TCP): a
  * webhook relay writes one JSON delivery per line to a socket; the
  * socket source adapts lines into the S1 envelope and the shared
  * transforms carry them to the colored scoreboard — the
  * SystemE2ESpec story with a live entrypoint instead of a capture
  * directory. */
class SocketIngestE2ESpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("tcp relay -> socket source -> streaming ingest -> colored scoreboard") {
    import spark.implicits._
    val out = tmp("graft-sock-out"); val chk = tmp("graft-sock-chk")
    def call(id: Int, owner: Long, hhmm: String, ev: String = "outbound_call") =
      s"""{"event":"$ev","body":{"id":$id,"owner_id":$owner,""" +
        s""""created_at":"2025-11-05 $hhmm:00",""" +
        s""""contact":{"timezone":"America/New_York"}}}"""
    val lines = Seq(
      call(1, 10, "14:00"), call(2, 10, "15:00"), call(3, 10, "16:00"),
      call(3, 10, "16:00"),                   // duplicate id
      call(4, 10, "16:30", "outbound_text"),
      call(5, 10, "17:00", "inbound_call"))   // dropped by F1

    // relay stand-in: accept one client (the socket source), write the
    // deliveries, keep the connection open until the query stops
    val server = new ServerSocket(0)
    @volatile var served: java.net.Socket = null
    val relay = new Thread(() => {
      try {
        served = server.accept()
        val w = new PrintWriter(served.getOutputStream, true)
        lines.foreach(w.println)
        w.flush()
      } catch { case _: Throwable => () }
    })
    relay.setDaemon(true); relay.start()

    val envelopes = StreamingIngest.socketSource(
      spark, "localhost", server.getLocalPort, "ALOWARE")
    val facts = StreamingIngest.transform(envelopes, roster = None)
    val q = StreamingIngest
      .parquetSink(facts, out.toString, chk.toString, triggerMs = 100)
      .start()
    try {
      // socket delivery is asynchronous: poll until the 4 admitted
      // facts land (dup + inbound dropped), bounded by a deadline
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n < 4 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = try spark.read.parquet(out.toString).count()
          catch { case _: Throwable => 0L }
        if (n < 4) Thread.sleep(200)
      }
    } finally {
      q.stop()
      if (served != null) served.close()
      server.close()
    }

    val written = spark.read.parquet(out.toString)
    written.select("eventId").as[String].collect().sorted shouldBe
      Array("ALOWARE:1", "ALOWARE:2", "ALOWARE:3", "ALOWARE:4")

    // the same analytical tail as SystemE2ESpec: dims + shift pace
    val day = LocalDate.of(2025, 11, 5)
    val shifts = Dims.dimShift(
      Seq(("10", 9, 17)).toDF("agentId", "startHour", "endHour"), day, day)
    val sb = Scoreboard.scoreboard(written, Dims.dimMetric(spark), shifts,
      lit(Timestamp.valueOf("2025-11-05 17:00:00")))
    val rows = sb.collect().map(r => r.getAs[String]("metricId") -> r).toMap
    rows("CALLS").getAs[Long]("n_events") shouldBe 3
    rows("CALLS").getAs[String]("color") shouldBe "RED"
    rows("TEXTS").getAs[Long]("n_events") shouldBe 1
  }
}
