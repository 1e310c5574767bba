package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Round-9 hardening invariants: the graph rounds' broadcast-fold
  * plan shape, the reliable-checkpoint lineage-cut option, and the
  * guard keeping d5's declared-quadratic baseline out of the
  * production curation flow.
  */
class Round9InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("g1/g3 round: ranks broadcast into the dst-bucketed edge table " +
      "— no shuffle exchange anywhere in the fold") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = GraphQueries.auditRound(spark, sfDir).queryExecution
      withClue(qe.executedPlan.toString) {
        qe.executedPlan.toString should include("graft_g_bipdst")
        qe.executedPlan.toString should include("BroadcastHashJoin")
        qe.executedPlan.collect {
          case e: ShuffleExchangeExec => e } shouldBe empty
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("graph rounds accept a reliable checkpoint dir: same results, " +
      "checkpoint files on disk (executor-loss parity)") {
    val base = Seq("g1_pagerank", "g3_seeded_ppr", "g4_label_prop")
      .map(q => q -> SparkEntry.queries(q)(spark, sfDir)
        .collect().map(_.toString).toSeq).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-gq-chk")
    GraphQueries.checkpointDirOverride = Some(dir.toString)
    try {
      base.foreach { case (q, want) =>
        SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toString).toSeq shouldBe want
      }
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => java.nio.file.Files.isRegularFile(p))
      files should be > 0L.toInt
    } finally GraphQueries.checkpointDirOverride = None
  }

  test("d5 stays an audit baseline: the production curation flow never " +
      "plans a quadratic pair join") {
    // d5 (exact all-pairs cosine) is the DECLARED O(n²) baseline the
    // blocked/ANN paths are audited against — it must never be
    // reachable from Curation.run, whose near-dup stage is the banded
    // LSH path. A nested-loop or cartesian join in the curated plan
    // would mean the quadratic leg leaked into production flow.
    val docs = graft.Tables(spark, sfDir, "documents")
    val result = graft.etl.Curation.run(docs)
    try {
      val plans = result.curated.queryExecution.executedPlan.toString
      plans should not include "CartesianProduct"
      plans should not include "BroadcastNestedLoopJoin"
      result.curated.count() should be > 0L
    } finally result.release()
  }
}
