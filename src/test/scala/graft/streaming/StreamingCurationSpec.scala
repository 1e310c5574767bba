package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.etl.Curation

/** Streaming curation must be the ingest-time analog of the batch
  * pipeline: same fixture in → same survivors out, and the streaming
  * observe counters ledger the same per-stage attrition the batch
  * report prints. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  // the CurationSpec fixture, verbatim — the parity contract is
  // "same corpus, same attrition"
  private val good = "the quick brown fox jumps over a lazy dog and then " +
    "it runs off to the woods in a hurry because the hunt is on tonight"
  private val goodDup = good.toUpperCase + "!!!"
  private val goodNear = good + " extra trailing clause here to shift it"
  private val nonEnglish = (1 to 30).map(i => s"wort$i").mkString(" ")
  private val tooShort = "the cat is in it"
  private val fixture = Seq(
    (1L, good), (2L, goodDup), (3L, goodNear),
    (4L, nonEnglish), (5L, tooShort))

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def json(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"${text.replace("\"", "\\\"")}"}"""

  test("file drop -> streaming curation: batch survivors, batch attrition counters") {
    val in = tmp("graft-cur-in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(in.toString)
    val q = StreamingCuration.ingest(stream)
      .writeStream.format("memory").queryName("curation_out")
      .outputMode("append").start()
    try {
      // drop one doc per file, in id order, processing between drops —
      // arrival order = id order, where streaming first-wins coincides
      // with batch min-id-wins
      fixture.foreach { case (id, text) =>
        Files.writeString(in.resolve(s"d$id.json"), json(id, text) + "\n")
        q.processAllAvailable()
      }

      // survivors match the batch pipeline on the same fixture
      val kept = spark.table("curation_out").select("id").as[Long].collect().toSet
      kept shouldBe Set(1L)

      // per-stage streaming counters == batch attrition report
      val batchReport = Curation.run(fixture.toDF("doc_id", "text"), minWords = 10)
        .report.map(s => s.stage -> s.docs).toMap
      import scala.jdk.CollectionConverters._
      def streamed(metric: String): Long = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(metric)))
        .map(_.getLong(0)).sum
      streamed("curation_input") shouldBe batchReport("input")
      streamed("curation_lang_gate") shouldBe batchReport("lang_gate")
      streamed("curation_quality_gate") shouldBe batchReport("quality_gate")
      streamed("curation_exact_dedup") shouldBe batchReport("exact_dedup")
      streamed("curation_near_dedup") shouldBe batchReport("near_dedup")
    } finally q.stop()
  }

  test("seedCorpus: ingest rejects near-dups of the existing corpus from batch one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the existing (already-admitted) corpus holds `good`
    val corpus = Seq((1L, good)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingCuration.ingest(
      input.toDF().toDF("doc_id", "text"),
      seedCorpus = Some(corpus))
    val q = out.writeStream.format("memory").queryName("curation_seeded")
      .outputMode("append").start()
    try {
      // FIRST batch: a near-dup and an exact (renormalized) dup of the
      // seeded doc are both rejected; fresh English content is admitted
      val fresh = "a completely different story about the sea and the " +
        "ships that sail far away to the north in winter when it is cold"
      input.addData((10L, goodNear), (11L, goodDup), (12L, fresh))
      q.processAllAvailable()
      spark.table("curation_seeded").select("id")
        .as[Long].collect().toSet shouldBe Set(12L)
    } finally q.stop()
  }

  test("stateTtlMs: timeout branches drop bucket and admit state; TTLs re-arm") {
    // deterministic TestGroupState harness (live-clock ms-TTL
    // streaming tests hang on this VM's checkpoint file-create path)
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val sig = Seq.fill(16)(7L)

    // band-bucket timeout: state dropped, nothing emitted
    val bGone = TestGroupState.create[List[(Long, Seq[Long])]](
      Optional.of(List((1L, sig))), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingCuration.bandGate(12, 64, stateTtlMs = 5000)(
      (0, "k"), Iterator.empty, bGone).toSeq shouldBe Seq.empty
    bGone.isRemoved shouldBe true

    // live band data under TTL: verdicts emit and the timeout re-arms
    val bLive = TestGroupState.create[List[(Long, Seq[Long])]](
      Optional.of(List((1L, sig))), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val vs = StreamingCuration.bandGate(12, 64, stateTtlMs = 5000)(
      (0, "k"),
      Iterator(StreamingCuration.BandedDoc(0, "k", 2L, "t", "t", sig)),
      bLive).toSeq
    vs.map(v => (v.docId, v.hit)) shouldBe Seq((2L, true))
    bLive.getTimeoutTimestampMs.get() shouldBe 6000L

    // admit-marker timeout: marker dropped silently...
    val aGone = TestGroupState.create[Boolean](
      Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingCuration.admit(5000)(9L, Iterator.empty, aGone)
      .toSeq shouldBe Seq.empty
    aGone.isRemoved shouldBe true
    // ...so a post-expiry redelivery re-admits (per-TTL-window
    // contract, same as StreamingNearDup.distinctHits)
    val aFresh = TestGroupState.create[Boolean](
      Optional.empty[Boolean], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    StreamingCuration.admit(5000)(
      9L, Iterator(StreamingCuration.Verdict(9L, "t", "t", hit = false)),
      aFresh).toSeq.map(_.id) shouldBe Seq(9L)
    aFresh.getTimeoutTimestampMs.get() shouldBe 6000L
  }

  test("exactStage: watermark bounds the ledger — dedup within window, re-admit after expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingCuration.exactStage(
      input.toDF().toDF("id", "norm", "ts"), Some("ts"), "10 minutes")
    val q = out.writeStream.format("memory").queryName("exact_wm")
      .outputMode("append").start()
    try {
      // same fingerprint twice inside the delay window: second dropped
      input.addData((1L, "same", at(0)), (2L, "same", at(1)))
      q.processAllAvailable()
      // unrelated doc an hour later advances the watermark to 10:50,
      // past "same"'s expiry (10:00 + 10 min)
      input.addData((3L, "other", at(60)))
      q.processAllAvailable()
      // the fingerprint's state was evicted: a (non-late) re-arrival
      // is admitted again — exact dedup is per-watermark-window
      input.addData((4L, "same", at(59)))
      q.processAllAvailable()
      spark.table("exact_wm").select("id").as[Long].collect().toSet shouldBe
        Set(1L, 3L, 4L)
    } finally q.stop()
  }

  test("exactStage without event time: the ledger is global (never re-admits)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingCuration.exactStage(
      input.toDF().toDF("id", "norm"), None, "10 minutes")
    val q = out.writeStream.format("memory").queryName("exact_global")
      .outputMode("append").start()
    try {
      input.addData((1L, "same"))
      q.processAllAvailable()
      input.addData((2L, "same"))
      q.processAllAvailable()
      spark.table("exact_global").select("id").as[Long].collect().toSet shouldBe
        Set(1L)
    } finally q.stop()
  }

  test("ingest with eventTimeCol: the full pipeline starts and curates " +
      "(watermark ledger chained with both stateful stages)") {
    // the headline option must survive Spark's unsupported-operation /
    // global-watermark checks on a REAL query: withWatermark +
    // dropDuplicatesWithinWatermark feeding two flatMapGroupsWithState
    // stages in one append-mode query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingCuration.ingest(
      input.toDF().toDF("doc_id", "text", "ts"),
      eventTimeCol = Some("ts"))
    val q = out.writeStream.format("memory").queryName("curation_wm_e2e")
      .outputMode("append").start()
    try {
      // batch 1: the batch-parity fixture — only `good` survives
      input.addData((1L, good, at(0)), (2L, goodDup, at(1)),
        (3L, goodNear, at(2)), (4L, nonEnglish, at(3)), (5L, tooShort, at(4)))
      q.processAllAvailable()
      spark.table("curation_wm_e2e").select("id")
        .as[Long].collect().toSet shouldBe Set(1L)
      // batch 2: an in-window exact redelivery is swallowed by the
      // watermarked ledger; fresh content is admitted
      val fresh = "a completely different story about the sea and the " +
        "ships that sail far away to the north in winter when it is cold"
      input.addData((7L, good, at(5)), (8L, fresh, at(6)))
      q.processAllAvailable()
      spark.table("curation_wm_e2e").select("id")
        .as[Long].collect().toSet shouldBe Set(1L, 8L)
    } finally q.stop()
  }

  test("checkpoint restart: all three state stores resume from a real " +
      "checkpoint dir — near-dups of pre-restart docs stay rejected") {
    // the deepest-state operator must survive the production lifecycle:
    // stop mid-stream, start a NEW query from the same checkpointLocation,
    // and the exact-dedup ledger + band buckets + admit markers must all
    // come back — if any were lost, goodNear/goodDup would be admitted
    // after the restart (their only rejection evidence is doc 1's
    // pre-restart state).
    val in = tmp("graft-cur-rst-in")
    val chk = tmp("graft-cur-rst-chk")
    val out = tmp("graft-cur-rst-out")
    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .json(in.toString)
      StreamingCuration.ingest(stream)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", chk.toString)
        .outputMode("append").start()
    }
    val q1 = start()
    try {
      Files.writeString(in.resolve("a.json"), json(1L, good) + "\n")
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: a fresh query object, same checkpoint — state restored
    val q2 = start()
    try {
      val fresh = "a completely different story about the sea and the " +
        "ships that sail far away to the north in winter when it is cold"
      Files.writeString(in.resolve("b.json"),
        json(7L, goodDup) + "\n" + json(9L, goodNear) + "\n" +
          json(12L, fresh) + "\n")
      q2.processAllAvailable()
    } finally q2.stop()

    spark.read.parquet(out.toString).select("id")
      .as[Long].collect().toSet shouldBe Set(1L, 12L)
  }

  test("redelivered and cross-batch near-dup content stays rejected") {
    val in = tmp("graft-cur-in2")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(in.toString)
    val q = StreamingCuration.ingest(stream)
      .writeStream.format("memory").queryName("curation_out2")
      .outputMode("append").start()
    try {
      Files.writeString(in.resolve("a.json"), json(1L, good) + "\n")
      q.processAllAvailable()
      // exact redelivery under a new id: exact-dedup ledger swallows it
      Files.writeString(in.resolve("b.json"), json(7L, good) + "\n")
      // near-dup arriving batches later: band state remembers doc 1
      Files.writeString(in.resolve("c.json"), json(9L, goodNear) + "\n")
      q.processAllAvailable()
      spark.table("curation_out2").select("id").as[Long].collect().toSet shouldBe
        Set(1L)
    } finally q.stop()
  }
}
