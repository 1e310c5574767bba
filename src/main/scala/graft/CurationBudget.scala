package graft

import org.apache.spark.sql.SparkSession

/** Per-stage cost attribution for the composed curation pipeline
  * (c1 / [[graft.etl.Curation]]) — the SCALING.md budget table.
  * Each stage already materializes behind a persist+count barrier,
  * so the barrier's wall-clock IS the stage's own increment (its
  * inputs are cached by the previous barrier). Runs the pipeline
  * REPS times and reports per-stage MEDIANS (the Bench convention —
  * one GC pause must not masquerade as a hot stage).
  *
  * `runMain graft.CurationBudget <sfDir> [reps]` → one JSON line +
  * a human table on stderr.
  */
object CurationBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
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
    val docs = Tables(spark, sfDir, "documents")
    docs.count() // absorb scan/codegen warmup outside rep 1

    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    var stages = Seq.empty[String]
    var lastCounts = Map.empty[String, Long]
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val r = graft.etl.Curation.run(docs)
      val wall = (System.nanoTime() - t0) / 1e9
      stages = r.report.map(_.stage)
      lastCounts = r.report.map(sc => sc.stage -> sc.docs).toMap
      r.report.foreach(sc => samples(sc.stage) ::= sc.secs)
      // the stage barriers don't see work that materializes OUTSIDE
      // them — ConnectedComponents' eager per-round jobs (near-dup
      // clustering) plus planning. Attribute it explicitly instead of
      // letting the table silently under-report the pipeline.
      samples("cc_rounds+plan") ::= math.max(0.0,
        wall - r.report.map(_.secs).sum)
      r.release()
    }
    stages = stages :+ "cc_rounds+plan"
    lastCounts = lastCounts + ("cc_rounds+plan" -> -1L)
    val medians = stages.map { st =>
      val xs = samples(st).sorted
      // true median: average the two middle samples for even rep
      // counts (xs(n/2) alone is the upper element — biased high)
      st -> (if (xs.size % 2 == 1) xs(xs.size / 2)
             else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2)
    }
    val total = medians.map(_._2).sum
    medians.foreach { case (st, s) =>
      System.err.println(
        f"[c1-budget] $st%-14s ${lastCounts(st)}%8d docs ${s}%7.3f s ${100 * s / total}%5.1f%%")
    }
    val stagesJson = medians.map { case (st, s) =>
      s""""$st":{"docs":${lastCounts(st)},"secs":$s}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"c1_stage_budget","sf":"$sfDir","reps":$reps,"total_secs":$total,"stages":$stagesJson}""")
    spark.stop()
  }
}
