package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** StreamingSampler must be the online twin of the batch fixed-step
  * systematic sampler: same integer step-crossing rule, bit-identical
  * picks on the same feed, plus the streaming-only contracts
  * (cross-batch budget state, late-delivery immunity, single pick per
  * multi-step doc, TTL lifecycle). */
class StreamingSamplerSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  // sf0.001 sources hold ~1.4k tokens each — 400 yields ~3 picks per
  // source, exercising repeated crossings without multi-step spans
  private val step = 400L

  private def feed: Seq[StreamingSampler.Doc] =
    Tables(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        expr("size(split(text, ' '))").cast("long").as("n"))
      .collect()
      .map(r => StreamingSampler.Doc(r.getString(0), r.getLong(1), r.getLong(2)))

  /** The batch twin with the same FIXED step (t27's rule, tot/N → S). */
  private def batchPicks: Set[(String, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        expr("size(split(text, ' '))").cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .filter(expr(s"cum div $step") > expr(s"(cum - n) div $step"))
      .withColumn("pick_no",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
      .select(col("source"), col("doc_id"), col("pick_no"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("batch parity: streaming picks are bit-identical to the batch rule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // id-ordered feed (the operator contract), split in two
    // micro-batches so the budget state must carry across batches
    val sorted = feed.sortBy(_.docId)
    val input = MemoryStream[StreamingSampler.Doc]
    val q = StreamingSampler.sample(input.toDS(), step)
      .writeStream.format("memory").queryName("sampler_stream")
      .outputMode("append").start()
    try {
      input.addData(sorted.take(sorted.length / 2))
      q.processAllAvailable()
      input.addData(sorted.drop(sorted.length / 2))
      q.processAllAvailable()
      val got = spark.table("sampler_stream")
        .select(col("source"), col("docId"), col("pickNo"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe batchPicks
      got.size should be > 0
    } finally q.stop()
  }

  test("late and duplicate deliveries neither double-count nor re-pick") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[(Long, Long, Long)](
      Optional.of((10L, 1500L, 0L)), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // docId 10 duplicate and late docId 5: ignored, state unchanged
    StreamingSampler.pick(step)("s",
      Iterator(StreamingSampler.Doc("s", 10L, 900L),
        StreamingSampler.Doc("s", 5L, 900L)), st).toSeq shouldBe empty
    st.get shouldBe ((10L, 1500L, 0L))
    // fresh docId 11 crosses 2000: one pick, budget advanced
    val out = StreamingSampler.pick(step)("s",
      Iterator(StreamingSampler.Doc("s", 11L, 900L)), st).toSeq
    out shouldBe Seq(StreamingSampler.Pick("s", 11L, 900L, 1L))
    st.get shouldBe ((11L, 2400L, 1L))
  }

  test("a doc spanning multiple step boundaries emits exactly one pick") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[(Long, Long, Long)](
      Optional.empty[(Long, Long, Long)], GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val out = StreamingSampler.pick(step)("s",
      Iterator(StreamingSampler.Doc("s", 1L, 9000L)), st).toSeq
    out.map(_.pickNo) shouldBe Seq(1L)
    st.get shouldBe ((1L, 9000L, 1L))
  }

  test("TTL: timeout drops the budget walk; fresh state restarts at zero") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[(Long, Long, Long)](
      Optional.of((10L, 1999L, 3L)), GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.empty[Long], hasTimedOut = true)
    StreamingSampler.pick(step, stateTtlMs = 1000L)("s",
      Iterator.empty, st).toSeq shouldBe empty
    st.exists shouldBe false
  }
}
