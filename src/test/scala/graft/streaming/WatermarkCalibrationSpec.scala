package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** The e33 → twins calibration loop: the batch lateness audit yields
  * the `withWatermark` delay, and that delay demonstrably (a) keeps
  * the whole disorder-injected replay that an uncalibrated tight
  * watermark measurably drops, and (b) is orders of magnitude
  * tighter than the ledger-style 14-day default — i.e. the
  * calibration is load-bearing in both directions. */
class WatermarkCalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("calibrated delay covers the laggiest partition's p99 and is " +
      ">=100x tighter than the 14-day default") {
    val audit = SparkEntry.queries("e33_late_audit")(spark, dir)
    val delay = WatermarkCalibration.delayFromAudit(audit)
    delay should endWith(" seconds")
    val secs = delay.stripSuffix(" seconds").toLong
    val maxP99us = audit.agg(max(col("p99_us"))).head().getLong(0)
    maxP99us should be > 0L // the transport model injects real disorder
    secs * 1000000L should be >= maxP99us
    secs should be <= (14L * 24 * 3600 / 100)
    // and ≥99% of EVERY partition's rows sit at or under the delay by
    // construction of p99 (integer-rank quantile, audited by e33)
    WatermarkCalibration.calibrate(spark, dir) shouldBe delay
  }

  test("per-partition delay map: each partition gets ITS OWN p99 (not " +
      "the fleet max), consistent with the merged-stream calibration") {
    val audit = SparkEntry.queries("e33_late_audit")(spark, dir)
    val perPart = WatermarkCalibration.delaysPerPartition(audit)
    val rows = audit.select(col("part").cast("string"), col("p99_us"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perPart.keySet shouldBe rows.keySet
    for ((p, delay) <- perPart) withClue(s"partition $p: ") {
      val secs = delay.stripSuffix(" seconds").toLong
      // covers its own p99 (with margin), floored at 1 s
      secs * 1000000L should be >= rows(p)
      secs should be >= 1L
      secs shouldBe math.max(1L, math.ceil(rows(p) * 1.25 / 1e6).toLong)
    }
    // the merged-stream delay is the max over the per-partition map
    // (same margin): a per-partition fleet never waits LONGER than
    // the merged query, and the lag-free partitions wait far less
    val merged = WatermarkCalibration.delayFromAudit(audit)
      .stripSuffix(" seconds").toLong
    perPart.values.map(_.stripSuffix(" seconds").toLong).max shouldBe merged
    perPart.values.map(_.stripSuffix(" seconds").toLong).min should
      be < merged
  }

  test("replayed through a windowed streaming agg, the calibrated " +
      "watermark keeps every row; a tight watermark drops late data") {
    implicit val sqlCtx = spark.sqlContext
    // the exact transport-disorder model e33 audits: partition
    // user_id % 8 delivers with p*30 s lag, FIFO within partitions
    val replay = graft.Tables(spark, dir, "events")
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        (col("user_id") % 8).as("part"))
      .withColumn("delivery_us", col("ts_us") + col("part") * lit(30000000L))
      .orderBy(col("delivery_us"), col("event_id"))
      .select(col("ts_us")).as[Long].collect()
    val sentinel1 = replay.max + 30L * 86400000000L
    val sentinel2 = sentinel1 + 60000000L
    // Adversarial-but-deterministic micro-batch boundaries: break a
    // new batch immediately BEFORE every late row, so the row that
    // advanced the high-water past it always sits in an earlier
    // batch and the watermark has already moved when the late row
    // arrives. A transport may flush anywhere; a calibrated
    // watermark must survive the worst flush points.
    val chunks = {
      val out = scala.collection.mutable.ListBuffer(
        scala.collection.mutable.ListBuffer.empty[Long])
      var hw = Long.MinValue
      for (ts <- replay) {
        if (hw > ts)
          out += scala.collection.mutable.ListBuffer.empty[Long]
        out.last += ts
        hw = math.max(hw, ts)
      }
      out.map(_.toSeq).toSeq
    }
    chunks.size should be > 10 // the corpus really has late rows

    def admitted(delay: String, name: String): Long = {
      val input = MemoryStream[Long]
      val counts = input.toDF().toDF("ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), "1 minute")).count()
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        // two far-future sentinels: the first advances the watermark
        // past every real window, the second runs the batch that
        // actually emits them (watermark(N) is computed from data
        // through batch N-1)
        input.addData(sentinel1); q.processAllAvailable()
        input.addData(sentinel2); q.processAllAvailable()
        // exclude the sentinels' own windows (threshold sits between
        // the real data and sentinel1, both far from any boundary)
        spark.table(name)
          .filter(col("window.start") <
            timestamp_micros(lit(replay.max + 86400000000L)))
          .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
      } finally q.stop()
    }

    val calibrated = WatermarkCalibration.calibrate(spark, dir)
    val total = replay.length.toLong
    val keptCal = admitted(calibrated, "wm_cal_out")
    val keptTight = admitted("0 seconds", "wm_tight_out")
    withClue(s"calibrated '$calibrated' lost rows: ") {
      keptCal shouldBe total
    }
    withClue("the tight watermark should demonstrably drop late rows " +
        s"(kept $keptTight of $total): ") {
      keptTight should be < total
    }
  }
}
