package graft.streaming

import graft.{SparkSpec, SparkEntry, Tables}
import graft.QueryPack.dec
import org.apache.spark.sql.functions._

/** StreamingHolt must be the continuous twin of the batch
  * e25_holt_trend fold: same α = β = ½ recursion in the same IEEE
  * order, so the last emission per entity matches the batch row
  * bit-for-bit; plus the streaming-only contracts (cross-batch
  * state, late-delivery immunity, TTL re-seed). */
class StreamingHoltSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def dailyTotals: Seq[StreamingHolt.DayTotal] =
    Tables(spark, sfDir, "events")
      .groupBy(col("user_id"),
        date_trunc("DAY", col("ts")).cast("date").as("day"))
      .agg((round(sum(dec(col("value"))), 2) * 100).cast("long").as("c"))
      .collect()
      .map(r => StreamingHolt.DayTotal(
        r.getLong(0), r.getDate(1).toLocalDate.toEpochDay.toInt, r.getLong(2)))

  test("batch parity: the final streamed (level, trend, forecast) per " +
      "entity is bit-identical to e25's") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sorted = dailyTotals.sortBy(d => (d.epochDay, d.entityId))
    val cut = sorted(sorted.length / 2).epochDay
    val input = MemoryStream[StreamingHolt.DayTotal]
    val q = StreamingHolt.smooth(input.toDS())
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("append").start()
    try {
      input.addData(sorted.filter(_.epochDay <= cut))
      q.processAllAvailable()
      // redeliver a slice of the first batch out of order: every row
      // must be swallowed (day <= newest seen per entity)
      input.addData(sorted.filter(_.epochDay <= cut).take(20))
      q.processAllAvailable()
      input.addData(sorted.filter(_.epochDay > cut))
      q.processAllAvailable()
      val streamedLast = spark.table("holt_stream")
        .as[StreamingHolt.Forecast].collect()
        .groupBy(_.entityId)
        .map { case (id, fs) =>
          val last = fs.maxBy(_.epochDay)
          id -> ((last.nDays, last.level, last.trend, last.forecast))
        }
      val batch = SparkEntry.queries("e25_holt_trend")(spark, sfDir)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      batch should not be empty
      streamedLast shouldBe batch
    } finally q.stop()
  }

  test("a late or duplicate day leaves state and output untouched") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[(Int, Double, Double, Long)](
      Optional.of((10, 500.0, 25.0, 4L)), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val out = StreamingHolt.advance()(1L,
      Iterator(StreamingHolt.DayTotal(1L, 10, 999L),
        StreamingHolt.DayTotal(1L, 3, 999L)), st).toSeq
    out shouldBe empty
    st.get shouldBe ((10, 500.0, 25.0, 4L))
  }

  test("TTL expiry drops the recursion; the next day re-seeds it") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val gone = TestGroupState.create[(Int, Double, Double, Long)](
      Optional.of((10, 500.0, 25.0, 4L)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    StreamingHolt.advance(5000)(1L, Iterator.empty, gone).toSeq shouldBe empty
    gone.isRemoved shouldBe true

    val fresh = TestGroupState.create[(Int, Double, Double, Long)](
      Optional.empty[(Int, Double, Double, Long)],
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out = StreamingHolt.advance(5000)(1L,
      Iterator(StreamingHolt.DayTotal(1L, 3, 4200L)), fresh).toSeq
    out.map(f => (f.nDays, f.level, f.trend, f.forecast)) shouldBe
      Seq((1L, 42.0, 0.0, 42.0))
    fresh.getTimeoutTimestampMs.get() shouldBe 6000L
  }
}
