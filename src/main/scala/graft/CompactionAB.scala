package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for [[graft.etl.CorpusLayout.compactPartitioned]]
  * (round 14): simulate the continuous sink fragmenting the
  * day-partitioned events serving tree (N micro-batch appends → N
  * small files per day directory), then A/B the serving reads before
  * and after the bin-packing rewrite — file counts, a pruned
  * one-day query (the e31 shape), and a full-layout scan. Emits one
  * JSON line and writes `compaction_ab.json`.
  *
  * `runMain graft.CompactionAB <sfDir> [nBatches]` */
object CompactionAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft-sf1"
    val nBatches = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = java.nio.file.Files
      .createTempDirectory("graft-compactab").toString + "/facts"

    // the continuous sink: nBatches micro-batch appends, each landing
    // one small file per day directory it touches
    val ev = Tables(spark, sfDir, "events")
      .withColumn("day", date_trunc("DAY", col("ts")).cast("date"))
      .withColumn("b", pmod(col("event_id"), lit(nBatches)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count()
    (0 until nBatches).foreach { b =>
      ev.filter(col("b") === b).drop("b")
        .repartition(col("day"))
        .sortWithinPartitions(col("day"), col("ts_ns"))
        .write.partitionBy("day").mode("append").parquet(path)
    }
    ev.unpersist(blocking = false)

    def fileCount(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(path))
    }

    // serving reads: the pruned one-day rollup (e31's shape) and a
    // full-layout scan rollup; min over reps (the bench protocol)
    // decimal sums: a float sum's value depends on accumulation order,
    // which the rewrite legitimately changes — the layout contract is
    // about BYTES READ, not float fold order
    def dayQuery(): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(path)
        .filter(col("day") === lit(java.sql.Date.valueOf("2024-01-10")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("s"))
        .orderBy(col("event_type")).collect()
    def fullQuery(): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("s"))
        .orderBy(col("event_type")).collect()
    def time(f: () => Any, reps: Int = 3): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.min

    val filesBefore = fileCount()
    val dayBeforeRows = dayQuery()
    val dayBefore = time(() => dayQuery())
    val fullBefore = time(() => fullQuery())

    val t0 = System.nanoTime()
    val rep = graft.etl.CorpusLayout.compactPartitioned(spark, path,
      partitionCols = Seq("day"), sortCols = Seq("ts_ns"),
      maxRecordsPerFile = 1 << 20)
    val compactSecs = (System.nanoTime() - t0) / 1e9

    val filesAfter = fileCount()
    val dayAfterRows = dayQuery()
    val dayAfter = time(() => dayQuery())
    val fullAfter = time(() => fullQuery())
    require(dayAfterRows.map(_.toString).toSeq ==
      dayBeforeRows.map(_.toString).toSeq,
      "compaction changed the served day-query result")
    require(filesAfter < filesBefore, "compaction did not reduce files")

    val out =
      s"""{"metric":"compaction_ab","sf":"$sfDir","micro_batches":$nBatches,"files_before":$filesBefore,"files_after":$filesAfter,"partitions_compacted":${rep.partitions.size},"compact_secs":${f"$compactSecs%.3f"},"day_query_before_s":${f"$dayBefore%.3f"},"day_query_after_s":${f"$dayAfter%.3f"},"full_scan_before_s":${f"$fullBefore%.3f"},"full_scan_after_s":${f"$fullAfter%.3f"}}"""
    println(out)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("compaction_ab.json"),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path).getParentFile)
    spark.stop()
  }
}
