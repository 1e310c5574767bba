package graft

import org.apache.spark.sql.SparkSession

/** Cold-start A/B for the DURABLE train-once artifacts (SCALING.md
  * evidence harness): in ONE JVM/window, time consumer queries from a
  * FRESH SparkSession with the durable cluster-label / quarantine
  * tables PRESENT (attach path) vs ABSENT (rebuild path — what every
  * fresh session paid before round 13). Legs alternate A B A B so a
  * degraded window shows up as intra-leg variance instead of biasing
  * one side; each leg uses a brand-new session, so per-session caches
  * (DocArtifacts, TextArtifacts) start cold in BOTH legs and the
  * delta isolates exactly what the durable tables save: the CC
  * rounds + the pair-index build behind the labels, and the 8-gram
  * decontamination probe behind the quarantine set. The absent leg's
  * rebuild re-writes the tables (build-or-attach), which slightly
  * inflates it by one bucketed write of id-scale rows — noted, and
  * negligible next to the builds it measures.
  *
  * `runMain graft.ColdStartAB <sfDir> [query,query,...]` */
object ColdStartAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1).split(",").toSeq
      else Seq("d6_dup_clusters", "t20_decontam_apply", "b1_corpus_build"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    try Tables(root, sfDir, "lineitem").count() catch { case _: Throwable => () }

    // every session that may hold registry cells — releasing from all
    // of them is how the ABSENT leg actually drops the durable tables
    // (onRetire runs on the cell-holding session's release)
    var sessions = List(root)
    def dropAll(): Unit = sessions.foreach { s =>
      try {
        graft.queries.DedupQueries.releaseArtifacts(s, sfDir)
        graft.queries.TextQueries.releaseArtifacts(s, sfDir)
        graft.queries.GraphQueries.releaseArtifacts(s, sfDir)
        graft.queries.BuildQueries.releaseArtifacts(s, sfDir)
      } catch { case _: Throwable => () }
    }

    /** One leg: fresh session, run each query once (the cold-start
      * cost) and once warm, return (name -> (cold, warm)). */
    def leg(): Map[String, (Double, Double)] = {
      val s = root.newSession()
      sessions ::= s
      names.map { n =>
        val fn = SparkEntry.queries(n)
        def once(): Double = {
          val t0 = System.nanoTime()
          Bench.drain(fn(s, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        n -> (once(), once())
      }.toMap
    }

    // seed the durable tables once (untimed) so leg 1 is PRESENT
    leg()
    val out = Seq("present", "absent", "present", "absent").map { mode =>
      if (mode == "absent") dropAll()
      val r = leg()
      val qs = names.map(n => f""""$n":[${r(n)._1}%.3f,${r(n)._2}%.3f]""")
        .mkString("{", ",", "}")
      println(s"""COLDSTART {"mode":"$mode","queries":$qs}""")
      (mode, r)
    }
    names.foreach { n =>
      val present = out.collect { case ("present", r) => r(n)._1 }.min
      val absent = out.collect { case ("absent", r) => r(n)._1 }.min
      println(f"COLDSTART SUMMARY $n: fresh-session cold run " +
        f"present=$present%.2f s absent=$absent%.2f s (${absent / present}%.2fx)")
    }
    root.stop()
  }
}
