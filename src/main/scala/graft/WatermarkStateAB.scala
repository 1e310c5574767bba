package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the CALIBRATED WATERMARK'S STATE PAYOFF (SCALING.md
  * evidence harness): the same event replay drives the sessionization
  * twin twice — once with the e33-calibrated disorder allowance
  * ([[graft.streaming.WatermarkCalibration.calibrate]]), once with an
  * OVERSIZED delay (the 14-day ledger TTL misapplied as a disorder
  * allowance, the exact confusion WatermarkCalibration exists to
  * kill) — and records the per-batch state-row / state-bytes series
  * from the progress log. WatermarkCalibrationSpec proves the
  * calibrated delay RETAINS late data; this harness measures what the
  * calibration SAVES: with the oversized delay the watermark never
  * passes a session's end, so every session ever opened stays in
  * state and nothing is emitted until the stream ends; calibrated,
  * state holds only the sessions the disorder allowance genuinely
  * keeps open. At 100 TB/day this gap is the difference between
  * session state that fits executor memory and state that grows with
  * corpus history.
  *
  * Replay shape: events are range-partitioned by `ts` into disjoint
  * time-ordered files (a drained, roughly-ordered transport backlog —
  * the e33 regime), consumed `fpt` files per trigger. Both legs see
  * byte-identical input; the only variable is the watermark delay.
  *
  * `runMain graft.WatermarkStateAB [sfDir]`; one JSON line + file. */
object WatermarkStateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "64").toInt
    val fpt = sys.env.getOrElse("SPARK_GRAFT_STREAM_ONE_FPT", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = "/dev/shm/graft-wmstate"
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(); ()
    }
    rmrf(new java.io.File(scratch))
    val inDir = s"$scratch/in"
    // FileStreamSource orders files by MODIFICATION TIME, and a single
    // parallel write stamps every part file with the same mtime — the
    // replay then arrives in arbitrary file order (measured: 38% of
    // events landed behind even a 260 s watermark). Write the time
    // buckets SEQUENTIALLY instead, one job per bucket in ascending
    // ts order, so mtime order == event-time order and the replay is
    // a drained, roughly-ordered backlog (the e33 regime: disorder
    // only within a bucket / at trigger boundaries).
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
    val (tsLo, tsHi) = {
      val r = ev.agg(min(unix_timestamp(col("ts"))),
        max(unix_timestamp(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val bucketed = ev
      .withColumn("bkt", least(lit(nFiles - 1),
        floor((unix_timestamp(col("ts")) - tsLo) * nFiles /
          (tsHi - tsLo + 1)).cast("int")))
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"), col("bkt"))
      .persist()
    bucketed.count()
    (0 until nFiles).foreach { i =>
      bucketed.filter(col("bkt") === i).drop("bkt")
        .sort(col("ts")).coalesce(1)
        .write.mode("append").json(inDir)
      Thread.sleep(5) // distinct mtimes even on a coarse-grained FS
    }
    bucketed.unpersist(blocking = false)

    val calibrated = graft.streaming.WatermarkCalibration.calibrate(spark, sfDir)
    System.err.println(s"WMSTATE calibrated delay: $calibrated")

    def leg(name: String, lateness: String): String = {
      val emitted = new java.util.concurrent.atomic.AtomicLong(0)
      val stream = spark.readStream
        .option("maxFilesPerTrigger", fpt)
        .schema("user_id LONG, ts TIMESTAMP").json(inDir)
      val sessions = graft.streaming.StreamingSessions.sessionize(
        stream, "user_id", "ts", gap = "30 minutes", lateness = lateness)
      // shared listener harness (graft.streaming.ProgressCollector):
      // complete series, registration-race-free
      val collected = graft.streaming.ProgressCollector.run(spark) {
        sessions.writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$scratch/chk-$name")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            emitted.addAndGet(b.count()); ()
          }
          .start()
      }
      val secs = collected.secs
      val series = {
        collected.series
          .filter(_.numInputRows > 0)
          .flatMap { p =>
            p.stateOperators.headOption.map { so =>
              val sst = Option(so.customMetrics)
                .map(m => m.getOrDefault("rocksdbTotalSSTFilesBytes",
                  java.lang.Long.valueOf(0L)).longValue()).getOrElse(0L)
              (p.batchId, so.numRowsTotal,
                if (sst > 0) sst else so.memoryUsedBytes,
                so.numRowsDroppedByWatermark)
            }
          }
      }
      val maxRows = if (series.isEmpty) -1L else series.map(_._2).max
      val finalRows = if (series.isEmpty) -1L else series.last._2
      val maxBytes = if (series.isEmpty) -1L else series.map(_._3).max
      val dropped = series.map(_._4).sum
      val seriesJson = series.map { case (b, r, by, d) =>
        s"""{"b":$b,"state_rows":$r,"state_bytes":$by,"dropped":$d}"""
      }.mkString("[", ",", "]")
      val line =
        s"""{"leg":"$name","lateness":"$lateness","secs":$secs,"emitted":${emitted.get()},"max_state_rows":$maxRows,"final_state_rows":$finalRows,"max_state_bytes":$maxBytes,"rows_dropped_by_watermark":$dropped,"batches":$seriesJson}"""
      System.err.println(s"WMSTATE LEG $line")
      line
    }

    val cal = leg("calibrated", calibrated)
    val over = leg("oversized", "14 days")
    val out =
      s"""{"metric":"watermark_state_ab","sf":"$sfDir","files":$nFiles,"files_per_trigger":$fpt,"gap":"30 minutes","calibrated":$cal,"oversized":$over}"""
    println(out)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("wmstate_out.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    rmrf(new java.io.File(scratch))
    spark.stop()
  }
}
