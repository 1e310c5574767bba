package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev harness: same-session interleaved A/B of a query's CURRENT
  * implementation (arm A, from SparkEntry) vs its optimization
  * candidate (arm B, from the pack's devVariants). Also asserts the
  * two arms produce identical sorted results before timing — a local
  * pre-check, not a substitute for the DuckDB oracle gate.
  *
  * `runMain graft.ABQuery <sfDir> <query>[,query...] <reps>`
  */
object ABQuery {
  def variants: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.SimilarityQueries.devVariants

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args(2).toInt
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
    val arms: Seq[(String, Boolean, (SparkSession, String) => DataFrame)] =
      names.flatMap { n =>
        Seq((n, false, SparkEntry.queries(n)), (n, true, variants(n)))
      }
    // result-identity pre-check (sorted rows, full schema)
    names.foreach { n =>
      val a = SparkEntry.queries(n)(spark, sfDir).collect().map(_.toString).sorted
      val b = variants(n)(spark, sfDir).collect().map(_.toString).sorted
      if (!(a.toSeq == b.toSeq)) {
        System.err.println(s"[abq] MISMATCH $n: A=${a.length} rows B=${b.length} rows")
        a.zipAll(b, "<missing>", "<missing>").filter(p => p._1 != p._2).take(5)
          .foreach { case (x, y) => System.err.println(s"  A: $x\n  B: $y") }
        sys.exit(1)
      }
      println(s"[abq] $n results identical (${a.length} rows)")
    }
    val samples =
      scala.collection.mutable.Map.empty[(String, Boolean), List[Double]]
        .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, arm, fn) <- arms) {
      val t0 = System.nanoTime()
      Bench.drain(fn(spark, sfDir))
      samples((name, arm)) ::= (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val a = samples((n, false)).min
      val b = samples((n, true)).min
      println(f"[abq] $n%-26s A=$a%6.3f B=$b%6.3f d=${b - a}%+.3f")
    }
    spark.stop()
  }
}
