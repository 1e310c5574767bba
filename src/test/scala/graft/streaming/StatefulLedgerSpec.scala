package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StatefulLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: String, id: String, at: String) =
    (key, id, Timestamp.valueOf(at))

  test("admits first per key, drops live dups, records seenAt, readmits after TTL") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val events = input.toDF().toDF("dedupKey", "eventId", "receivedAt")
    val q = StatefulLedger.admitFirst(events, ttlDays = 14)
      .writeStream.format("memory").queryName("ledger_out")
      .outputMode("append").start()
    try {
      // batch 1: two events same key → one admitted (earliest wins)
      input.addData(
        ev("K1", "e2", "2024-01-01 10:00:05"),
        ev("K1", "e1", "2024-01-01 10:00:00"),
        ev("K2", "e3", "2024-01-01 10:00:01"))
      q.processAllAvailable()
      // batch 2: K1 again within TTL → dropped
      input.addData(ev("K1", "e4", "2024-01-05 09:00:00"))
      q.processAllAvailable()
      // batch 3: advance the watermark past K1's TTL (2024-01-15)
      // via another key; batch 4 then fires K1's timeout (timeouts
      // process in the batch AFTER the watermark passes, for groups
      // with no new data — the ledger's async-TTL-deletion analog)
      input.addData(ev("K3", "e5", "2024-01-20 10:00:00"))
      q.processAllAvailable()
      input.addData(ev("K3", "e6", "2024-01-20 11:00:00")) // dup, forces a batch
      q.processAllAvailable()
      // batch 5: K1 state expired → readmits
      input.addData(ev("K1", "e7", "2024-01-21 10:00:02"))
      q.processAllAvailable()

      val rows = spark.table("ledger_out")
        .select("dedupKey", "eventId", "seenAt")
        .as[(String, String, Timestamp)].collect().sortBy(_._2)
      rows.map(_._2).toSeq shouldBe Seq("e1", "e3", "e5", "e7")
      val k1 = rows.find(_._2 == "e1").get
      k1._3 shouldBe Timestamp.valueOf("2024-01-01 10:00:00") // seenAt = first arrival
    } finally q.stop()
  }
}
