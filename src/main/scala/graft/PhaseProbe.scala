package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Dev harness: split a query's wall time into Catalyst phases
  * (parsing/analysis/optimization/planning) vs execution, and count
  * the jobs/stages/tasks it schedules. This tells us whether a
  * sub-second query is paying for the plan or for the cluster.
  *
  * `runMain graft.PhaseProbe <sfDir> <query>[,query...] [reps]`
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1; stages += j.stageInfos.size
          tasks += j.stageInfos.map(_.numTasks).sum
          jobStart.put(j.jobId, j.time)
          ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStart.getOrDefault(j.jobId, j.time)
          jobLines.add(f"job=${j.jobId} ${(j.time - t0) / 1e3}%.3fs")
          ()
        }
      })
    try Tables(spark, sfDir, "lineitem").count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        jobs = 0; stages = 0; tasks = 0; jobLines.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        // the drain sink, inlined so we can read the sink df's tracker
        val sink = df
          .select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
          .agg(expr("bit_xor(h)"))
        sink.collect()
        val tEnd = System.nanoTime()
        // phase times of the sink's QueryExecution (analysis/optimization/
        // planning); execution-time jobs counted by the listener
        Thread.sleep(150) // let listener events drain
        val phases = sink.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"[probe] $name run$i wall=${(tEnd - t0) / 1e9}%.3f s " +
          f"build=${(tBuild - t0) / 1e9}%.3f s jobs=$jobs stages=$stages " +
          f"tasks=$tasks $phases")
        if (i == reps)
          println(s"[probe-jobs] $name " +
            jobLines.toArray.mkString(" "))
      }
    }
    spark.stop()
  }
}
