package graft.etl

import java.nio.file.{Files, Path}

import graft.SparkSpec

class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: Path = {
    val root = Files.createTempDirectory("graft-replay")
    val sub = Files.createDirectory(root.resolve("day1"))
    Files.writeString(root.resolve("a_call.json"),
      """{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:00:00"}}""" + "\n")
    Files.writeString(sub.resolve("b_call.json"),
      """{"event":"outbound_call","body":{"id":2,"owner_id":11,"created_at":"2025-11-05 11:00:00"}}""" + "\n")
    Files.writeString(root.resolve("c_text.json"),
      """{"event":"outbound_text","body":{"id":3,"owner_id":10,"created_at":"2025-11-05 12:00:00"}}""" + "\n")
    Files.writeString(root.resolve("notes.txt"), "not json\n")
    root.toFile.deleteOnExit(); root
  }

  private val emptyLedger =
    Seq.empty[(String, java.sql.Timestamp, Long)].toDF("pk", "seenAt", "expiresAt")

  test("recursive listing keeps only *.json and replays all lines (S3)") {
    val (out, sum) = Replay.run(spark, dir.toString, "ALOWARE",
      emptyLedger, None, nowEpochSec = 1800000000L)
    sum.files shouldBe 3
    sum.lines shouldBe 3
    sum.processed shouldBe 3
    out.facts.select("eventId").as[String].collect().sorted shouldBe
      Array("ALOWARE:1", "ALOWARE:2", "ALOWARE:3")
  }

  test("substring pattern filter (F5)") {
    val env = Replay.envelopes(spark, dir.toString, "ALOWARE", pattern = Some("_call"))
    env.count() shouldBe 2
  }

  test("deterministic file order + limit N files (O1)") {
    val env = Replay.envelopes(spark, dir.toString, "ALOWARE", limit = Some(2))
    // path order: <root>/a_call.json, <root>/c_text.json, <root>/day1/b_call.json
    val files = env.select("src_file").distinct().as[String].collect().sorted
    files.length shouldBe 2
    files(0) should endWith("a_call.json")
    files(1) should endWith("c_text.json")
  }
}
