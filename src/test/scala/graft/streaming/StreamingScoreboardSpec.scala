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
}
