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

  test("query-per-partition fleet: each stream runs its OWN calibrated " +
      "delay — zero drops, and peak state strictly under the merged " +
      "query at the global max-p99 delay") {
    implicit val sqlCtx = spark.sqlContext
    // A DENSE two-partition transport (one event/second for 2 h per
    // partition — dense enough that held window state is visible,
    // unlike the sparse sf0.001 minutes): partition 0 delivers live,
    // partition 1 delivers 30 min behind. Merged, partition 1's rows
    // are ~1800 s late vs the high-water; within each partition the
    // feed is FIFO.
    val t0 = 1700000000000000L // µs
    val nPerPart = 7200
    val lagUs = 1800L * 1000000
    val rows = // (ts_us, part, delivery_us)
      (0 until nPerPart).map(i => (t0 + i * 1000000L, 0L, t0 + i * 1000000L)) ++
      (0 until nPerPart).map(i => (t0 + i * 1000000L, 1L, t0 + i * 1000000L + lagUs))
    val replay = rows.sortBy(r => (r._3, r._2)).map(r => (r._1, r._2))
    val total = replay.length.toLong
    val chunks = replay.grouped(replay.length / 40 + 1).toSeq
    val sentinelTs = replay.map(_._1).max + 30L * 86400000000L

    // the lateness AUDIT over this replay — e33's definition (event
    // lateness vs the merged delivery high-water), then the
    // per-partition p99 map and the merged max-p99 delay
    val lateness = {
      var hw = Long.MinValue
      replay.map { case (ts, p) =>
        val late = math.max(0L, hw - ts); hw = math.max(hw, ts); (p, late)
      }
    }
    val p99 = lateness.groupBy(_._1).map { case (p, xs) =>
      val sorted = xs.map(_._2).sorted
      (p, sorted(math.ceil(sorted.length * 0.99).toInt - 1))
    }
    val audit = p99.toSeq.map { case (p, us) => (p, us) }
      .toDF("part", "p99_us")
    val perPart = WatermarkCalibration.delaysPerPartition(audit)
    val globalDelay = WatermarkCalibration.delayFromAudit(audit)
    // the laggy partition dominates the merged delay; the live one
    // gets the 1 s floor in the fleet map
    perPart("0") shouldBe "1 seconds"
    globalDelay shouldBe perPart("1")

    /** One leg: feed each stream its chunk slices through a
      * windowed count at its own delay, recording summed state rows
      * after every chunk. Returns (admitted real rows, peak state,
      * per-stream peak). */
    def leg(name: String, parts: Seq[Long], delayOf: Long => String,
        partOf: ((Long, Long)) => Long): (Long, Long, Map[Long, Long]) = {
      // state keyed (window × part) in BOTH legs — the merged query
      // must hold one row per partition per open window, exactly what
      // it would with per-partition grouping keys downstream
      val ins = parts.map(p => p -> MemoryStream[(Long, Long)]).toMap
      val qs = parts.map { p =>
        val counts = ins(p).toDF().toDF("ts_us", "part")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", delayOf(p))
          .groupBy(window(col("ts"), "1 minute"), col("part")).count()
        p -> counts.writeStream.format("memory")
          .queryName(s"${name}_p$p").outputMode("append").start()
      }.toMap
      try {
        var peak = 0L
        val lastRows = scala.collection.mutable.Map.empty[Long, Long]
        val perStreamPeak = scala.collection.mutable.Map.empty[Long, Long]
        chunks.foreach { chunk =>
          chunk.groupBy(partOf).foreach { case (k, rs) =>
            ins(k).addData(rs)
            qs(k).processAllAvailable()
            Option(qs(k).lastProgress)
              .flatMap(_.stateOperators.headOption)
              .foreach { so =>
                lastRows(k) = so.numRowsTotal
                perStreamPeak(k) = math.max(
                  perStreamPeak.getOrElse(k, 0L), so.numRowsTotal)
              }
          }
          peak = math.max(peak, lastRows.values.sum)
        }
        // sentinels flush every real window through append mode
        parts.foreach { p =>
          ins(p).addData((sentinelTs, p)); qs(p).processAllAvailable()
          ins(p).addData((sentinelTs + 60000000L, p))
          qs(p).processAllAvailable()
        }
        val admitted = parts.map { p =>
          spark.table(s"${name}_p$p")
            .filter(col("window.start") <
              timestamp_micros(lit(sentinelTs - 86400000000L)))
            .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0)
        }.sum
        (admitted, peak, perStreamPeak.toMap)
      } finally qs.values.foreach(_.stop())
    }

    // FLEET: one stream per partition, each with its own p99 delay
    val (fleetKept, fleetPeak, fleetPer) = leg("wmfleet", Seq(0L, 1L),
      p => perPart(p.toString), _._2)
    // MERGED: one stream at the global max-p99 delay (pseudo-id 99)
    val (mergedKept, mergedPeak, _) = leg("wmmerged", Seq(99L),
      _ => globalDelay, _ => 99L)

    withClue(s"fleet (delays $perPart) dropped rows: ") {
      fleetKept shouldBe total
    }
    withClue(s"merged ('$globalDelay') dropped rows: ") {
      mergedKept shouldBe total
    }
    // THE claim behind delaysPerPartition: isolated under its own
    // calibrated delay, the well-behaved partition finalizes its
    // windows immediately instead of inheriting the laggiest
    // partition's horizon — the fleet's total held state is a
    // fraction of the merged query's
    withClue(s"fleet peak $fleetPeak vs merged peak $mergedPeak: ") {
      fleetPeak should be < mergedPeak
    }
    withClue(s"live partition's peak state ${fleetPer(0L)}: ") {
      fleetPer(0L) should be <= 3L // finalizes on its own 1 s schedule
    }
  }
}
