package graft
import org.apache.spark.sql.SparkSession

/** Scale-soak main (SCALING.md): runs a named query subset twice and
  * reports the WARM (2nd) run per query — the first run is charged
  * with train-once artifact builds (DocArtifacts/PqArtifacts/
  * GraphArtifacts) and JIT, which a steady-state cluster amortizes.
  * Compare warm times across SF dirs to measure scaling exponents.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_BENCH_FILTER=q1,q2 …
  * runMain graft.Soak
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keep: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
        case Some(f) => f.split(',').toSet
        case None    => _ => true
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Tables(spark, sfDir, "lineitem").count() catch { case _: Throwable => () }
    val qs = SparkEntry.queries.toSeq.filter(kv => keep(kv._1)).sortBy(_._1)
    // A throwing query contributes NO time: elapsed-until-throw would
    // understate it and make breakage read as a scaling win. It lands
    // in the "failed" list instead (same contract as Bench).
    val failed = scala.collection.mutable.SortedSet.empty[String]
    val warm = qs.flatMap { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { Bench.drain(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"SOAK ERROR $name: $e"); failed += name; None
        }
      }
      // a cold failure marks the query failed AND skips the warm run:
      // its "warm" time would silently absorb the artifact build the
      // cold run was supposed to amortize, and a query must never
      // appear in both the timings and the failed list
      if (once().isEmpty) None
      else once().map(name -> _)
    }
    val body = warm.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"warm_total","value":${warm.map(_._2).sum},"unit":"sec","queries":$body,"failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty)
      System.err.println(s"SOAK FAILED QUERIES (${failed.size}): ${failed.mkString(", ")}")
    spark.stop()
  }
}
