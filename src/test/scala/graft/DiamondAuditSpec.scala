package graft

import org.apache.spark.sql.execution.SparkPlan

/** The unfused-diamond audit: a frame referenced by two downstream
  * branches is PLANNED TWICE unless cached — Catalyst does not fuse
  * sibling branches, and exchange reuse saves only the shuffle write,
  * not the downstream CPU. This gate walks every gated query's
  * physical plan (AQE off so the whole tree is visible) and flags any
  * subtree that (a) appears 2+ times and (b) re-executes 2+ heavy
  * operators in its live region — i.e. above its cached frames
  * (InMemoryTableScan) and reused exchanges, both physical leaves.
  *
  * Found (and fixed) by this audit in round 11: t28's rank-window
  * argmax re-ran the whole (source, word) cascade (2.37 → 1.82 s at
  * sf3), d15's two containment directions re-ran the candidate+verify
  * cascade (20.99 → 11.85 s at sf3), e32's exact and sketch legs each
  * re-ran the contribute-to-window cascade, e33's total re-ran the
  * lateness cascade, s6's size join re-ran both Lloyd scans, d19's
  * three consumers re-ran the split-assignment tail.
  */
class DiamondAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Remaining duplicated subtrees, each deliberate: metadata- or
    * id-scale frames where a cache would cost more than the recompute.
    */
  private val allow: Map[String, String] = Map(
    // d19_leakage_split's entry was pruned in round 13: it now reads
    // the durable cluster-label table instead of re-running the CC
    // build, so the id-scale distinct diamond no longer exists
    // s13_nprobe_sweep's entry was pruned in round 18: its cell-rank
    // frame is now localized (QueryPack.localize), so the per-probe-
    // level re-plan no longer exists
    "s20_filtered_ann" -> ("the query-side assignment frame (10 " +
      "queries x k centroids) shared by pre/post-filter legs"),
    "t29_mix_schedule" -> ("the #sources-row share frame re-planned " +
      "for the sorted-fold denominator: the corpus scan + per-source " +
      "agg behind it lands as a ReusedExchange, so the re-executed " +
      "region is one ~20-row final aggregate + a broadcast cross " +
      "join — cheaper than any cache (t12 has the same shape but " +
      "dodges canonical equality via an extra retained column)"))

  test("no query re-executes a heavy cascade through an unfused diamond") {
    val heavy = Set("HashAggregate", "ObjectHashAggregate",
      "SortAggregate", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastHashJoin", "BroadcastNestedLoopJoin", "Sort",
      "Window", "Generate", "Expand", "ShuffleExchange")
    def liveHeavy(p: SparkPlan): Int = p.collect {
      case e if heavy.exists(e.getClass.getSimpleName.startsWith) => e
    }.size
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flagged = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan
        val counts = scala.collection.mutable.Map.empty[String, (Int, Int)]
        def walk(p: SparkPlan): Unit = {
          // InputAdapter / WholeStageCodegen are transparent wrappers
          // whose canonical form equals the child's — counting them
          // would double-count every subtree
          val transparent =
            p.getClass.getSimpleName.startsWith("InputAdapter") ||
              p.getClass.getSimpleName.startsWith("WholeStageCodegen")
          if (!transparent) {
            val s = p.canonicalized.toString
            val (n, _) = counts.getOrElse(s, (0, 0))
            counts(s) = (n + 1, liveHeavy(p))
          }
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
        }
        walk(plan)
        if (counts.values.exists { case (n, h) => n >= 2 && h >= 2 })
          Some(name)
        else None
      }
      val unexpected = flagged.filterNot(allow.contains)
      withClue(s"unfused diamonds re-executing heavy cascades: $unexpected\n") {
        unexpected shouldBe empty
      }
      // the allowlist must not rot: every entry still reproduces
      val gone = allow.keys.toSeq.sorted.filterNot(flagged.contains)
      withClue(s"allowlisted diamonds no longer present — prune: $gone\n") {
        gone shouldBe empty
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
