package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming near-dup detection: hits must cross micro-batch
  * boundaries (that's the stateful point) and agree with the batch
  * d3 semantics on what matches. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"word$i").mkString(" ")
  private val nearDup = base + " tail" // superset: 38 of 39 shingles shared
  private val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
  private val unrelated2 = (1 to 30).map(i => s"alien$i").mkString(" ")

  test("near-dups are detected across micro-batches; unrelated text is not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = hits.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      spark.table("neardup_out").count() shouldBe 0 // nothing matches yet

      // batch 2: a near-dup of doc 1 and a fresh unrelated doc
      input.addData((3L, nearDup), (4L, unrelated2))
      q.processAllAvailable()
      val out = spark.table("neardup_out")
        .select("d1", "d2", "sigMatches")
        .as[(Long, Long, Int)].collect().toSet
      out.map(h => (h._1, h._2)) shouldBe Set((3L, 1L)) // found its original
      all(out.map(_._3)) should be >= 12
    } finally q.stop()
  }

  test("detectSeeded: the stream dedups against a batch corpus from batch one") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val hits = StreamingNearDup.detectSeeded(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", corpus)
    val q = hits.writeStream.format("memory").queryName("neardup_seeded")
      .outputMode("append").start()
    try {
      // FIRST batch: a near-dup of pre-indexed doc 1 is caught
      // immediately (unseeded detect would see an empty bucket here),
      // and fresh unrelated content passes
      input.addData((10L, nearDup), (11L, unrelated2))
      q.processAllAvailable()
      val out = spark.table("neardup_seeded")
        .select("d1", "d2", "sigMatches")
        .as[(Long, Long, Int)].collect().toSet
      out.map(h => (h._1, h._2)) shouldBe Set((10L, 1L))
      all(out.map(_._3)) should be >= 12

      // live updates keep working on top of the seed: a dup of the
      // STREAMED doc 11 also resolves
      input.addData((12L, unrelated2 + " tail"))
      q.processAllAvailable()
      spark.table("neardup_seeded").select("d1", "d2")
        .as[(Long, Long)].collect().toSet shouldBe Set((10L, 1L), (12L, 11L))
    } finally q.stop()
  }

  test("FIFO cap evicts the oldest bucket members, bounding state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    try {
      // three exact copies fill the 2-slot buckets; doc 20 evicts 21's
      // predecessor history as it lands
      input.addData((20L, base)); q.processAllAvailable()
      input.addData((21L, base)); q.processAllAvailable()
      input.addData((22L, base)); q.processAllAvailable()
      // bucket now holds [22, 21] — 20 was evicted; the next copy must
      // match only the surviving two
      input.addData((23L, base)); q.processAllAvailable()
      val partners = spark.table("neardup_evict")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
        .filter(_._1 == 23L).map(_._2)
      partners shouldBe Set(21L, 22L)
    } finally q.stop()
  }

  test("detectOnce: one row per pair across multi-band collisions and redeliveries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.detectOnce(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_once")
      .outputMode("append").start()
    try {
      input.addData((1L, base)); q.processAllAvailable()
      // an EXACT copy collides in all 4 bands → 4 Hit rows upstream,
      // but exactly one PairHit must come out
      input.addData((3L, base)); q.processAllAvailable()
      val first = spark.table("neardup_once")
        .select("d1", "d2", "sigMatches").as[(Long, Long, Int)].collect()
      first.toSeq shouldBe Seq((3L, 1L, 16))

      // redelivery of the same doc re-collides in every band; the pair
      // state swallows all of it
      input.addData((3L, base)); q.processAllAvailable()
      spark.table("neardup_once").count() shouldBe 1

      // a fresh near-dup still gets its own (single) rows
      input.addData((5L, base)); q.processAllAvailable()
      val pairs = spark.table("neardup_once")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      pairs shouldBe Set((3L, 1L), (5L, 1L), (5L, 3L))
    } finally q.stop()
  }

  test("stateTtlMs: timeout branch removes bucket state; data batches re-arm the TTL") {
    // deterministic TestGroupState harness — a live-clock streaming
    // test of a ms-scale processing-time TTL flakes on slow boxes
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val stored = List((1L, Seq.fill(16)(7L)))

    // timeout invocation: state must be dropped, nothing emitted
    val timedOut = TestGroupState.create[List[(Long, Seq[Long])]](
      Optional.of(stored), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingNearDup.bucketUpdate(12, 64, stateTtlMs = 5000)(
      (0, "k"), Iterator.empty, timedOut).toSeq shouldBe Seq.empty
    timedOut.isRemoved shouldBe true

    // data invocation with a TTL: matches emit AND the timeout re-arms
    val live = TestGroupState.create[List[(Long, Seq[Long])]](
      Optional.of(stored), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val hits = StreamingNearDup.bucketUpdate(12, 64, stateTtlMs = 5000)(
      (0, "k"), Iterator(StreamingNearDup.Banded(0, "k", 2L, Seq.fill(16)(7L))),
      live).toSeq
    hits.map(h => (h.d1, h.d2)) shouldBe Seq((2L, 1L))
    live.getTimeoutTimestampMs.get() shouldBe 6000L // batch time + TTL
    live.get.map(_._1) shouldBe List(2L, 1L)

    // pair-dedup stage: timeout drops the emitted-marker, so an
    // expired pair WOULD re-emit (documented trade) — and a live
    // second sighting is swallowed
    val pairGone = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingNearDup.pairDedup(5000)((2L, 1L), Iterator.empty, pairGone)
      .toSeq shouldBe Seq.empty
    pairGone.isRemoved shouldBe true
    val pairSeen = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    StreamingNearDup.pairDedup(5000)(
      (2L, 1L), Iterator(StreamingNearDup.Hit(1, 2L, 1L, 16)), pairSeen)
      .toSeq shouldBe Seq.empty
    pairSeen.getTimeoutTimestampMs.get() shouldBe 6000L
  }

  test("TTL re-emission contract: pair uniqueness is per-TTL-window, not global") {
    // The full lifecycle, pinned so consumers can rely on it:
    //  1. first sighting emits (and arms the TTL);
    //  2. later sightings inside the window are swallowed;
    //  3. at expiry the emitted-marker is dropped silently;
    //  4. a sighting AFTER expiry emits again — i.e. with stateTtlMs
    //     set, "(d1,d2) appears once" holds WITHIN one TTL window
    //     only. Global uniqueness requires stateTtlMs = 0 (or a
    //     downstream batch dedup). This is the documented trade for
    //     bounded state on an unbounded stream.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def freshState = TestGroupState.create[Boolean](
      Optional.empty[Boolean], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val hit = StreamingNearDup.Hit(0, 2L, 1L, 14)

    // 1. first sighting: emits, marker set, TTL armed
    val s1 = freshState
    StreamingNearDup.pairDedup(5000)((2L, 1L), Iterator(hit), s1)
      .toSeq.map(p => (p.d1, p.d2)) shouldBe Seq((2L, 1L))
    s1.get shouldBe true
    s1.getTimeoutTimestampMs.get() shouldBe 6000L

    // 2. re-sighting within the window: swallowed, TTL re-armed
    val s2 = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      3000L, Optional.empty[Long], hasTimedOut = false)
    StreamingNearDup.pairDedup(5000)((2L, 1L), Iterator(hit), s2)
      .toSeq shouldBe Seq.empty
    s2.getTimeoutTimestampMs.get() shouldBe 8000L // sliding, not fixed

    // 3. expiry: marker dropped, nothing emitted
    val s3 = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      9000L, Optional.empty[Long], hasTimedOut = true)
    StreamingNearDup.pairDedup(5000)((2L, 1L), Iterator.empty, s3)
      .toSeq shouldBe Seq.empty
    s3.isRemoved shouldBe true

    // 4. post-expiry sighting: the pair re-emits (fresh state again)
    val s4 = freshState
    StreamingNearDup.pairDedup(5000)((2L, 1L), Iterator(hit), s4)
      .toSeq.map(p => (p.d1, p.d2)) shouldBe Seq((2L, 1L))

    // and with stateTtlMs = 0 no timeout is ever armed → global dedup
    val s5 = TestGroupState.create[Boolean](
      Optional.empty[Boolean], GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    StreamingNearDup.pairDedup(0)((2L, 1L), Iterator(hit), s5)
      .toSeq.map(p => (p.d1, p.d2)) shouldBe Seq((2L, 1L))
    s5.getTimeoutTimestampMs.isPresent shouldBe false
  }

  test("duplicate of a duplicate still resolves against bucket history") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_chain")
      .outputMode("append").start()
    try {
      input.addData((10L, base)); q.processAllAvailable()
      input.addData((11L, base)); q.processAllAvailable() // exact dup
      input.addData((12L, base)); q.processAllAvailable() // third copy
      val pairs = spark.table("neardup_chain")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      // 11 matched 10; 12 matched both 10 and 11
      pairs shouldBe Set((11L, 10L), (12L, 10L), (12L, 11L))
    } finally q.stop()
  }
}
