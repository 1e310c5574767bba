package graft.streaming

import graft.{SparkSpec, SparkEntry, Tables}
import graft.QueryPack.dec
import org.apache.spark.sql.functions._

/** StreamingAnomaly must be the continuous twin of the batch
  * e21_zscore_anomaly sweep: same exact-cents window arithmetic, same
  * flags, plus the streaming-only contracts (cross-batch state,
  * late-delivery immunity, TTL lifecycle). */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The batch query's daily-cents frame, as streaming input rows. */
  private def dailyTotals: Seq[StreamingAnomaly.DayTotal] =
    Tables(spark, sfDir, "events")
      .groupBy(col("user_id"),
        date_trunc("DAY", col("ts")).cast("date").as("day"))
      .agg((round(sum(dec(col("value"))), 2) * 100).cast("long").as("c"))
      .collect()
      .map(r => StreamingAnomaly.DayTotal(
        r.getLong(0), r.getDate(1).toLocalDate.toEpochDay.toInt, r.getLong(2)))

  test("batch parity: streaming flags are bit-identical to e21's") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // day-ordered feed (the operator contract), split in two
    // micro-batches so the window state must carry across batches
    val sorted = dailyTotals.sortBy(d => (d.epochDay, d.entityId))
    val cut = sorted(sorted.length / 2).epochDay
    val input2 = MemoryStream[StreamingAnomaly.DayTotal]
    val q2 = StreamingAnomaly.detect(input2.toDS())
      .writeStream.format("memory").queryName("anomaly_stream2")
      .outputMode("append").start()
    try {
      input2.addData(sorted.filter(_.epochDay <= cut))
      q2.processAllAvailable()
      input2.addData(sorted.filter(_.epochDay > cut))
      q2.processAllAvailable()
      val streamed = spark.table("anomaly_stream2")
        .as[StreamingAnomaly.Anomaly].collect()
        .map(a => (a.entityId, a.epochDay.toLong, a.observed, a.mean7, a.z))
        .toSet
      val batch = SparkEntry.queries("e21_zscore_anomaly")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
          r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toSet
      batch should not be empty
      streamed shouldBe batch
    } finally q2.stop()
  }

  test("late and duplicate deliveries are ignored (state unchanged)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val window = (1 to 7).map(d => (d, 100L)).toList
    val st = TestGroupState.create[List[(Int, Long)]](
      Optional.of(window), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // duplicate of day 7 and a late day 3: no output, buffer unchanged
    val out = StreamingAnomaly.score()(1L,
      Iterator(StreamingAnomaly.DayTotal(1L, 7, 999L),
        StreamingAnomaly.DayTotal(1L, 3, 999L)), st).toSeq
    out shouldBe empty
    st.get shouldBe window
  }

  test("a flat window never divides by zero; a spike past it flags") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val flat = (1 to 7).map(d => (d, 100L)).toList
    val st = TestGroupState.create[List[(Int, Long)]](
      Optional.of(flat), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // variance 0 → no score, but the day still enters the window
    StreamingAnomaly.score()(1L,
      Iterator(StreamingAnomaly.DayTotal(1L, 8, 100000L)), st).toSeq shouldBe empty
    st.get.last shouldBe ((8, 100000L))
    // a modest-variance window flags a spike well past it
    val spread = List(100L, 102L, 98L, 101L, 99L, 103L, 97L)
      .zipWithIndex.map { case (c, i) => (i + 1, c) }
    val st2 = TestGroupState.create[List[(Int, Long)]](
      Optional.of(spread), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val out = StreamingAnomaly.score()(1L,
      Iterator(StreamingAnomaly.DayTotal(1L, 8, 200L)), st2).toSeq
    out should have size 1
    out.head.z should be > 2.0
  }

  test("window buffer is capped at 7 and slides in day order") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[List[(Int, Long)]](
      Optional.empty[List[(Int, Long)]], GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    StreamingAnomaly.score()(1L,
      (1 to 12).iterator.map(d => StreamingAnomaly.DayTotal(1L, d, 100L * d)), st)
      .toSeq // drain
    st.get.map(_._1) shouldBe (6 to 12).toList
  }

  test("TTL: timeout drops the window; fresh state re-arms") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val gone = TestGroupState.create[List[(Int, Long)]](
      Optional.of(List((1, 100L))), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingAnomaly.score(5000)(1L, Iterator.empty, gone).toSeq shouldBe empty
    gone.isRemoved shouldBe true

    val fresh = TestGroupState.create[List[(Int, Long)]](
      Optional.empty[List[(Int, Long)]], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    StreamingAnomaly.score(5000)(1L,
      Iterator(StreamingAnomaly.DayTotal(1L, 1, 100L)), fresh).toSeq
    fresh.getTimeoutTimestampMs.get() shouldBe 6000L
  }
}
