package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: same-session interleaved A/B of runtime SQL confs.
  * This VM has monotonic multi-minute degraded windows (SCALING.md),
  * so back-to-back full runs confound config effects with drift; here
  * each rep runs arm A then arm B in the SAME session minutes apart,
  * and per-query mins are compared arm-to-arm.
  *
  * `runMain graft.ABConf <sfDir> <filter> <reps> <k=v;k=v...>`
  * (arm A = session defaults, arm B = the given confs; every conf is
  * restored between arms).
  */
object ABConf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args(2).toInt
    val confs = args(3).split(';').filter(_.contains('='))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k.trim, v.trim) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Tables(spark, sfDir, "lineitem").count() catch { case _: Throwable => () }
    val qs = SparkEntry.queries.toSeq.filter(kv => names.contains(kv._1))
      .sortBy(_._1)
    val defaults = confs.map { case (k, _) =>
      (k, spark.conf.getOption(k))
    }
    def setArm(b: Boolean): Unit =
      if (b) confs.foreach { case (k, v) => spark.conf.set(k, v) }
      else defaults.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    val samples =
      scala.collection.mutable.Map.empty[(String, Boolean), List[Double]]
        .withDefaultValue(Nil)
    // warm both arms
    for (arm <- Seq(false, true)) {
      setArm(arm)
      qs.foreach { case (_, fn) => Bench.drain(fn(spark, sfDir)) }
    }
    for (_ <- 1 to reps; arm <- Seq(false, true)) {
      setArm(arm)
      for ((name, fn) <- qs) {
        val t0 = System.nanoTime()
        Bench.drain(fn(spark, sfDir))
        samples((name, arm)) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    var ta = 0.0; var tb = 0.0
    qs.foreach { case (name, _) =>
      val a = samples((name, false)).min
      val b = samples((name, true)).min
      ta += a; tb += b
      println(f"[ab] $name%-26s A=$a%6.3f B=$b%6.3f d=${b - a}%+.3f")
    }
    println(f"[ab] TOTAL A=$ta%.2f B=$tb%.2f ratio=${tb / ta}%.3f")
    spark.stop()
  }
}
