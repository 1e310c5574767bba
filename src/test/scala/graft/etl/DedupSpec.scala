package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("D1 first-wins keeps the earliest arrival per key") {
    val df = Seq(
      ("k1", ts("2024-01-01 10:00:00"), "first"),
      ("k1", ts("2024-01-01 11:00:00"), "second"),
      ("k2", ts("2024-01-01 09:00:00"), "only")
    ).toDF("eventId", "receivedAt", "payload")
    val out = Dedup.withinBatchFirstWins(df, "eventId", col("receivedAt"))
      .orderBy("eventId").as[(String, Timestamp, String)].collect()
    out.map(_._3).toSeq shouldBe Seq("first", "only")
  }

  test("D1 is idempotent: f(f(x)) == f(x) over random key multisets") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val keys = List.fill(rnd.nextInt(50) + 1)(rnd.nextInt(10))
      val df = keys.zipWithIndex
        .map { case (k, i) => (s"k$k", ts("2024-01-01 00:00:00"), i.toLong) }
        .toDF("eventId", "receivedAt", "idx")
      val once = Dedup.withinBatchFirstWins(df, "eventId", col("receivedAt"), col("idx"))
      val twice = Dedup.withinBatchFirstWins(once, "eventId", col("receivedAt"), col("idx"))
      val a = once.orderBy("eventId").collect().toSeq
      val b = twice.orderBy("eventId").collect().toSeq
      a shouldBe b
      a.map(_.getString(0)).toSet shouldBe keys.map(k => s"k$k").toSet
    }
  }

  private val now = 1700000000L // fixed clock

  test("D2 admits new keys, drops live duplicates, readmits expired ones") {
    val events = Seq("A:1", "A:2", "A:3").map(k => (k, s"payload-$k"))
      .toDF("dedupKey", "payload")
    val ledger = Seq(
      ("A:1", new Timestamp((now - 1000) * 1000), now + 86400), // live → dup
      ("A:2", new Timestamp((now - 1000) * 1000), now - 1)      // expired → readmit
    ).toDF("pk", "seenAt", "expiresAt")
    val (admitted, delta) = Dedup.ledgerDedup(events, ledger, now, ttlDays = 14)
    admitted.select("dedupKey").as[String].collect().sorted shouldBe Array("A:2", "A:3")
    val d = delta.orderBy("pk").as[(String, Timestamp, Long)].collect()
    d.map(_._1).toSeq shouldBe Seq("A:2", "A:3")
    all(d.map(_._3)) shouldBe now + 14L * 86400
  }

  test("D2 replay is idempotent: union delta into ledger, re-run admits none") {
    val events = Seq(("A:9", "p")).toDF("dedupKey", "payload")
    val ledger0 = Seq.empty[(String, Timestamp, Long)].toDF("pk", "seenAt", "expiresAt")
    val (admitted1, delta) = Dedup.ledgerDedup(events, ledger0, now)
    admitted1.count() shouldBe 1
    val ledger1 = ledger0.union(delta)
    val (admitted2, _) = Dedup.ledgerDedup(events, ledger1, now + 10)
    admitted2.count() shouldBe 0
  }
}
