package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time named queries, optionally print the formatted
  * plan. `runMain graft.TimeOne <sfDir> <query>[,query...] [explain]` */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // match Bench: sort shuffle writer + tmpfs shuffle dirs (see
      // Bench.scala) so timings here predict BENCH numbers
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        Bench.drain(fn(spark, sfDir)) // full materialization, same sink as Bench
        println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
