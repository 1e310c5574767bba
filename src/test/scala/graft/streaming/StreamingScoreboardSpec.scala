package graft.streaming

import java.sql.{Date, Timestamp}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The serving store must converge to the batch scoreboard: update
  * mode re-emits a group's LATEST count whenever it changes, and
  * upsert-by-key makes replays/late increments idempotent. */
object MapUpsert extends StreamingScoreboard.Upsert {
  val store = new ConcurrentHashMap[(String, String, Date), Long]()
  override def upsert(agentId: String, metricId: String, day: Date,
      nEvents: Long): Unit = { store.put((agentId, metricId, day), nEvents); () }
}

class StreamingScoreboardSpec extends SparkSpec {
  import spark.implicits._

  private def fact(agent: String, metric: String, day: String, at: String) =
    (agent, metric, Date.valueOf(day), Timestamp.valueOf(at))

  test("update-mode counts upsert into the serving store and converge") {
    implicit val sqlCtx = spark.sqlContext
    MapUpsert.store.clear()
    val input = MemoryStream[(String, String, Date, Timestamp)]
    val facts = input.toDF().toDF("agentId", "metricId", "factDateKey", "receivedAt")
    val chk = java.nio.file.Files.createTempDirectory("graft-sb").toString
    val q = StreamingScoreboard.serve(
      StreamingScoreboard.counts(facts), MapUpsert, chk, triggerMs = 100).start()
    try {
      input.addData(
        fact("a1", "CALLS", "2024-01-02", "2024-01-02 09:00:00"),
        fact("a1", "CALLS", "2024-01-02", "2024-01-02 09:05:00"),
        fact("a2", "TEXTS", "2024-01-02", "2024-01-02 09:06:00"))
      q.processAllAvailable()
      MapUpsert.store.get(("a1", "CALLS", Date.valueOf("2024-01-02"))) shouldBe 2L
      MapUpsert.store.get(("a2", "TEXTS", Date.valueOf("2024-01-02"))) shouldBe 1L

      // next batch: a1 gains one more call → only that group re-emits
      // with its NEW total, and the upsert replaces the stale value
      input.addData(fact("a1", "CALLS", "2024-01-02", "2024-01-02 09:30:00"))
      q.processAllAvailable()
      MapUpsert.store.get(("a1", "CALLS", Date.valueOf("2024-01-02"))) shouldBe 3L
      MapUpsert.store.get(("a2", "TEXTS", Date.valueOf("2024-01-02"))) shouldBe 1L
      MapUpsert.store.size shouldBe 2
    } finally q.stop()
  }

  test("watermark on the day key evicts closed days and drops their stragglers") {
    implicit val sqlCtx = spark.sqlContext
    MapUpsert.store.clear()
    val input = MemoryStream[(String, String, Date, Timestamp)]
    val facts = input.toDF().toDF("agentId", "metricId", "factDateKey", "receivedAt")
    val chk = java.nio.file.Files.createTempDirectory("graft-sb-wm").toString
    val q = StreamingScoreboard.serve(
      StreamingScoreboard.counts(facts, lateness = "2 days"),
      MapUpsert, chk, triggerMs = 100).start()
    try {
      input.addData(fact("a1", "CALLS", "2024-01-02", "2024-01-02 09:00:00"))
      q.processAllAvailable()
      // a much newer day advances the watermark to 2024-01-08 and
      // closes day 2 (state evicted, not just idle)
      input.addData(fact("a1", "CALLS", "2024-01-10", "2024-01-10 09:00:00"))
      q.processAllAvailable()
      q.processAllAvailable() // second batch so the new watermark applies
      // a straggler for the closed day must be DROPPED: the count for
      // day 2 stays 1 (were the group still open, it would become 2)
      input.addData(fact("a1", "CALLS", "2024-01-02", "2024-01-10 10:00:00"))
      q.processAllAvailable()
      MapUpsert.store.get(("a1", "CALLS", Date.valueOf("2024-01-02"))) shouldBe 1L
      MapUpsert.store.get(("a1", "CALLS", Date.valueOf("2024-01-10"))) shouldBe 1L
    } finally q.stop()
  }
}
