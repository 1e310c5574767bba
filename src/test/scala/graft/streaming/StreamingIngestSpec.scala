package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured-Streaming ingest: same transforms as batch, state-store
  * dedup across micro-batches (SURVEY §2.9). */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def call(id: Int, owner: Long, at: String): (String, String, Timestamp) =
    ("ALOWARE",
      s"""{"event":"outbound_call","body":{"id":$id,"owner_id":$owner,
         |"created_at":"$at"}}""".stripMargin.replace("\n", ""),
      Timestamp.valueOf(at))

  test("streaming pipeline dedups across micro-batches via watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val envelopes = input.toDF()
      .toDF("source", "body", "receivedAt")
      .selectExpr("source", "map('h','v') AS headers", "body", "receivedAt")

    val facts = StreamingIngest.transform(envelopes, roster = None)
    val q = facts.writeStream
      .format("memory")
      .queryName("facts_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: two events, one duplicated within the batch
      input.addData(
        call(1, 10, "2025-11-05 10:00:00"),
        call(1, 10, "2025-11-05 10:00:01"),
        call(2, 11, "2025-11-05 10:00:02"))
      q.processAllAvailable()
      // batch 2: id=1 again (cross-batch dup) + a new id=3
      input.addData(
        call(1, 10, "2025-11-05 10:05:00"),
        call(3, 12, "2025-11-05 10:05:01"))
      q.processAllAvailable()
      val out = spark.table("facts_out")
        .select("eventId").as[String].collect().sorted
      out shouldBe Array("ALOWARE:1", "ALOWARE:2", "ALOWARE:3")
    } finally q.stop()
  }

  test("streaming scoreboard: windowed counts with watermark (A3 streaming form)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val counts = input.toDF().toDF("agentId", "metricId", "eventTime")
      .withWatermark("eventTime", "1 hour")
      .groupBy(window($"eventTime", "15 minutes"), $"agentId", $"metricId")
      .count()
    val q = counts.writeStream
      .format("memory").queryName("sb_out").outputMode("complete").start()
    try {
      input.addData(
        (1L, "CALLS", Timestamp.valueOf("2024-01-02 09:01:00")),
        (1L, "CALLS", Timestamp.valueOf("2024-01-02 09:07:00")),
        (1L, "CALLS", Timestamp.valueOf("2024-01-02 09:20:00")))
      q.processAllAvailable()
      val rows = spark.table("sb_out")
        .select($"window.start".cast("string"), $"count")
        .as[(String, Long)].collect().toMap
      rows("2024-01-02 09:00:00") shouldBe 2
      rows("2024-01-02 09:15:00") shouldBe 1
    } finally q.stop()
  }
}
