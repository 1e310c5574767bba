package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec

/** [[StreamingEnrich.recentJoin]]: window membership, cross-batch
  * buffering, and the left-outer null row for update-less events. */
class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val base = Timestamp.valueOf("2026-01-01 10:00:00")
  private def at(min: Int) = new Timestamp(base.getTime + min * 60000L)

  test("events join every dimension update inside the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val updates = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingEnrich.recentJoin(
      events.toDF().toDF("user", "ts", "etype"),
      updates.toDF().toDF("u_user", "u_ts", "goal"),
      "user", "u_user", "ts", "u_ts",
      lookback = "60 minutes", delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      // update arrives FIRST (cross-batch: must be buffered in state)
      updates.addData((7L, at(0), "goal_v1"))
      q.processAllAvailable()
      // event 30 min later joins v1; a second update lands in-window too
      updates.addData((7L, at(20), "goal_v2"))
      events.addData((7L, at(30), "purchase"))
      // an update AFTER the event must not match (condition: u_ts <= ts)
      updates.addData((7L, at(31), "goal_v3"))
      // an update for another user never matches user 7
      updates.addData((8L, at(25), "other_user"))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("user", "goal").as[(Long, String)].collect().toSet
      got shouldBe Set((7L, "goal_v1"), (7L, "goal_v2"))

      // user 8's only update was at(25); an event at(90) is 65 min
      // later — OUTSIDE the 60-min lookback, so inner join drops it
      events.addData((8L, at(90), "click"))
      q.processAllAvailable()
      spark.table("enrich_out").filter($"user" === 8L).count() shouldBe 0
    } finally q.stop()
  }

  test("left outer emits the no-update event with nulls after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, String)]
    val updates = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingEnrich.recentJoin(
      events.toDF().toDF("user", "ts", "etype"),
      updates.toDF().toDF("u_user", "u_ts", "goal"),
      "user", "u_user", "ts", "u_ts",
      lookback = "60 minutes", delay = "10 minutes",
      joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("enrich_lo")
      .outputMode("append").start()
    try {
      events.addData((1L, at(0), "signup"))
      q.processAllAvailable()
      // nothing emitted yet: an in-window update could still arrive
      spark.table("enrich_lo").count() shouldBe 0
      // advance BOTH watermarks far past the event's eligibility
      events.addData((2L, at(300), "tick"))
      updates.addData((99L, at(300), "tick"))
      q.processAllAvailable()
      events.addData((2L, at(310), "tick2"))
      updates.addData((99L, at(310), "tick2"))
      q.processAllAvailable()
      val row = spark.table("enrich_lo").filter($"user" === 1L)
        .select("etype", "goal").collect()
      row should have length 1
      row(0).getString(0) shouldBe "signup"
      row(0).isNullAt(1) shouldBe true
    } finally q.stop()
  }
}
