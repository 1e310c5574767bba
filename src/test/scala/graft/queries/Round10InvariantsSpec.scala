package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Round-10 hardening invariants: g2's edge build rides the durable
  * ok-bucketed incidence table (zero edge-side exchanges — the
  * steepest sf10 curve's dominant cost), locked at the executed-plan
  * level.
  */
class Round10InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("g2 edge build: the co-occurrence self-join reads the bucketed " +
      "incidence table on both sides with zero shuffle exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = GraphQueries.auditEdgeBuild(spark, sfDir).queryExecution
      withClue(qe.executedPlan.toString) {
        qe.executedPlan.toString should include("graft_g_inc")
        qe.executedPlan.collect {
          case e: ShuffleExchangeExec => e } shouldBe empty
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("g2 result is unchanged by the bucketed edge-build re-root " +
      "(triangle counts still match the per-node degree bound)") {
    val rows = SparkEntry.queries("g2_triangles")(spark, sfDir).collect()
    rows.length should be > 0
    // every node's triangle count is bounded by C(deg, 2)
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      withClue(s"node ${r.get(0)}: ") {
        tri should be <= deg * (deg - 1) / 2
      }
    }
  }
}
