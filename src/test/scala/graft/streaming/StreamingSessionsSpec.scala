package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Sessions close on event-time silence and emit once, complete —
  * and must agree with the batch e6 semantics (same gap rule). */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, at: String) = (user, Timestamp.valueOf(at))

  test("sessions split on gap, merge within it, emit only when closed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingSessions.sessionize(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts", gap = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two bursts 2 h apart (→ two sessions); user 2: one event
      input.addData(
        ev(1, "2024-01-02 09:00:00"), ev(1, "2024-01-02 09:10:00"),
        ev(1, "2024-01-02 11:30:00"),
        ev(2, "2024-01-02 09:05:00"))
      q.processAllAvailable()
      // nothing final yet: the watermark sits at the max seen ts and
      // no session end + gap precedes it except the morning ones
      val afterBatch1 = spark.table("sess_out").count()

      // a late-day event pushes the watermark past everything above
      input.addData(ev(9, "2024-01-02 23:00:00"))
      q.processAllAvailable()
      input.addData(ev(9, "2024-01-02 23:59:00")) // advance once more
      q.processAllAvailable()

      val out = spark.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 != 9L).sortBy(r => (r._1, r._2.getTime))
      out.map(r => (r._1, r._2.toString, r._4)) shouldBe Seq(
        (1L, "2024-01-02 09:00:00.0", 2L), // burst merged: 09:00+09:10
        (1L, "2024-01-02 11:30:00.0", 1L),
        (2L, "2024-01-02 09:05:00.0", 1L))
      // session end = last event + gap (the close rule)
      out.head._3.toString shouldBe "2024-01-02 09:40:00.0"
      afterBatch1 should be <= out.size.toLong // append-only, no retraction
    } finally q.stop()
  }
}
