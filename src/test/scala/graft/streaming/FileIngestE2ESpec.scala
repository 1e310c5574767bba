package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** End-to-end streaming deployment shape (SURVEY §2.1 S1-S3 → §2.8
  * K1): raw webhook JSON lands in a drop directory, the file source
  * streams it through the shared transforms, foreachBatch appends
  * parquet facts. */
class FileIngestE2ESpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("file drop -> streaming ingest -> parquet facts") {
    val in = tmp("graft-in"); val out = tmp("graft-out"); val chk = tmp("graft-chk")
    Files.writeString(in.resolve("w1.json"),
      """{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:00:00"}}
        |{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:00:01"}}
        |{"event":"inbound_call","body":{"id":2,"owner_id":11}}
        |{"event":"outbound_text","body":{"id":3,"owner_id":11,"created_at":"2025-11-05 10:00:02"}}
        |""".stripMargin)
    val envelopes = StreamingIngest.fileSource(spark, in.toString, "ALOWARE")
    val facts = StreamingIngest.transform(envelopes, roster = None)
    val q = StreamingIngest
      .parquetSink(facts, out.toString, chk.toString, triggerMs = 100)
      .start()
    try q.processAllAvailable() finally q.stop()

    val written = spark.read.parquet(out.toString)
    written.select("eventId").as[String].collect().sorted shouldBe
      Array("ALOWARE:1", "ALOWARE:3") // dup dropped, inbound dropped
    written.select("metricId").as[String].collect().sorted shouldBe
      Array("CALLS", "TEXTS")

    // late drop of a duplicate file: checkpointed state still dedups
    Files.writeString(in.resolve("w2.json"),
      """{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:07:00"}}
        |{"event":"outbound_call","body":{"id":4,"owner_id":12,"created_at":"2025-11-05 10:07:01"}}
        |""".stripMargin)
    val q2 = StreamingIngest
      .parquetSink(StreamingIngest.transform(
        StreamingIngest.fileSource(spark, in.toString, "ALOWARE"), None),
        out.toString, chk.toString, triggerMs = 100)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(out.toString).select("eventId").as[String]
      .collect().sorted shouldBe Array("ALOWARE:1", "ALOWARE:3", "ALOWARE:4")
  }

  test("file drop -> streaming ingest -> retrying push sink (K1/K2 streaming)") {
    import graft.etl.{FlakyPusher, PushSink}
    val in = tmp("graft-pin"); val chk = tmp("graft-pchk")
    Files.writeString(in.resolve("w1.json"),
      """{"event":"outbound_call","body":{"id":21,"owner_id":10,"created_at":"2025-11-05 10:00:00"}}
        |{"event":"outbound_text","body":{"id":22,"owner_id":11,"created_at":"2025-11-05 10:00:01"}}
        |{"event":"outbound_call","body":{"id":21,"owner_id":10,"created_at":"2025-11-05 10:00:02"}}
        |""".stripMargin)
    FlakyPusher.chunks.clear(); FlakyPusher.attempts.set(0)
    FlakyPusher.failFirst = 1 // first push of the stream 429s, retry lands it
    val facts = StreamingIngest.transform(
      StreamingIngest.fileSource(spark, in.toString, "ALOWARE"), roster = None)
    val q = StreamingIngest.pushSink(facts, chk.toString, FlakyPusher,
      chunkSize = 10,
      retry = PushSink.RetryPolicy(maxAttempts = 3, initialDelayMs = 1),
      rateLimit = Some(PushSink.RateLimit(requestsPerSec = 1000.0)),
      numPartitions = Some(1), triggerMs = 100)
      .start()
    try q.processAllAvailable() finally q.stop()

    val pushed = scala.jdk.CollectionConverters
      .CollectionHasAsScala(FlakyPusher.chunks).asScala.toSeq.flatten
    pushed.map(_.split("\"EventID\":\"")(1).split("\"")(0)).sorted shouldBe
      Seq("ALOWARE:21", "ALOWARE:22") // dedup upstream, each pushed once
    FlakyPusher.attempts.get should be >= 2 // the 429 + the successful retry
  }
}
