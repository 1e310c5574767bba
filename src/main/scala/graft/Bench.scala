package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Benchmark main: one JSON line with per-query medians.
  *
  * Methodology: each query runs REPS times (default 3) and reports the
  * per-query MEDIAN, so one GC pause / VM-scheduler hiccup doesn't
  * masquerade as a plan problem. The sink aggregates xxhash64 over a
  * struct of every output column — unlike `.count()`, Catalyst cannot
  * prune projections (or the sorts feeding them), so projection-heavy
  * queries are charged for the work they claim to do.
  */
object Bench {
  private val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt

  /** Force every column of every row to materialize. XOR (not SUM) the
    * row hashes: uniform 64-bit hashes overflow a Long SUM, which
    * throws under ANSI mode; XOR is closed over Long. */
  def drain(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // File-create syscalls dominate multi-stage queries on this VM:
      // the bypass-merge shuffle writer opens R files per map task
      // (R×M per shuffle). Forcing the sort writer (1 file/task) and
      // tmpfs shuffle dirs removes minute-scale run-to-run variance —
      // measured via executor jstack sampling (DiskBlockObjectWriter
      // .open dominated all hot frames).
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session/codegen/scan init so the first measured
    // query isn't charged for JVM warmup
    try Tables(spark, sfDir, "lineitem").count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        try drain(fn(spark, sfDir)) catch {
          case e: Throwable => System.err.println(s"BENCH ERROR $name: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","method":"median_of_${Reps}_full_materialize"}""")
    spark.stop()
  }
}
