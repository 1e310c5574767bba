package graft

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Plan-shape regressions: the scale properties each query's design
  * depends on, asserted against the optimized/executed plans at
  * sf0.001 (shapes, not sizes — they hold at any SF). */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("e3: event-time range predicates reach the parquet scan") {
    val p = plan("e3_hourly_rollup")
    p should include("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,")
  }

  test("e31: the calendar filter is PARTITION pruning on the serving layout") {
    // the Today-style filter must reach the scan as a PartitionFilter
    // (whole directories skipped), not a post-scan Filter node
    val p = plan("e31_day_serving")
    p should include("PartitionFilters: [isnotnull(day")
    // the EQUALITY itself must be a PartitionFilter — isnotnull alone
    // (with the day predicate demoted to a post-scan Filter) would
    // still read every directory
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
    pf should include regex """\(day#\d+ = """
  }

  test("q2/e1: dimension joins broadcast, fact side never builds") {
    plan("q2_star_join") should include("BroadcastHashJoin")
    plan("e1_scoreboard") should include("BroadcastHashJoin")
  }

  test("d2/d3/d4: inverted-index self-joins never broadcast the index") {
    // Size-bounded sides MAY broadcast (d2's hot-shingle anti list,
    // ≤ |index|/maxDf; d4's bucket-size table, ≤ nBlocks×2^blockBits;
    // tiny per-doc set tables at this SF). The lock is that the
    // index-sized candidate self-joins — keyed on __sh (d2), band
    // (d3), or the refined key2 (d4) — stay shuffled hash joins.
    // d3's gated query reads the DocArtifacts cache, so its candidate
    // join is audited on the fresh pipeline the registry build runs.
    def planOf(q: String): String = q match {
      case "d3_minhash_lsh" =>
        graft.queries.DedupQueries.d3FreshPlan(spark, dir)
          .queryExecution.executedPlan.toString
      case "d2_ngram_jaccard" =>
        graft.queries.DedupQueries.d2FreshPlan(spark, dir)
          .queryExecution.executedPlan.toString
      case _ => plan(q)
    }
    Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash").foreach { q =>
      withClue(q) {
        val p = planOf(q)
        val indexJoins = p.linesIterator.filter(l =>
          l.contains("Join") && !l.contains("LeftAnti") &&
            (l.contains("__sh") || l.contains("band") ||
              l.contains("key2"))).toList
        p should include("ShuffledHashJoin")
        indexJoins.filter(_.contains("BroadcastHashJoin")) shouldBe empty
      }
    }
  }

  test("d9/d10: positional-gram and banded-index self-joins never broadcast") {
    // same lock as d2-d4: the index-sized candidate joins (gram hash
    // for d9, band/key for d10) must stay shuffled hash joins; only
    // size-bounded frames (hot-gram anti list) may broadcast
    Seq("d9_substring_dedup", "d10_incremental_lsh").foreach { q =>
      withClue(q) {
        val p = plan(q)
        p should include("ShuffledHashJoin")
        val idxJoins = p.linesIterator.filter(l =>
          l.contains("Join") && !l.contains("LeftAnti") &&
            (l.contains("__g") || l.contains("band"))).toList
        idxJoins.filter(_.contains("BroadcastHashJoin")) shouldBe empty
      }
    }
  }

  test("d8: the cell-bound chunk key reaches the pair join") {
    // BoundedPairs must key the join on (cluster, __t), not cluster
    // alone — otherwise a degenerate cell is one quadratic reducer
    val p = plan("d8_semdedup")
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("__t")).toList
    joinLines should not be empty
  }

  test("e10: the as-of operator plans as one merge with a sort per side") {
    val p = plan("e10_asof_operator")
    p should include("AsOfJoin")
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 2
  }

  test("q1: aggregation is partial before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    // partial HashAggregate appears below the exchange, final above
    p.indexOf("HashAggregate") should be >= 0
    "HashAggregate".r.findAllIn(p).size should be >= 2
  }

  test("q6: selective scan keeps only the projected columns") {
    val p = plan("q6_selective_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // 4 filter/agg columns, not the 11-column lineitem row
    readSchema should include("l_quantity")
    readSchema should not include "l_orderkey"
    readSchema should not include "l_returnflag"
  }

  test("e12: salted rollup aggregates in two keyed phases (no single hot reducer)") {
    val p = plan("e12_salted_rollup")
    // phase 1 groups on (event_type, __salt): the salt column must
    // reach a HashAggregate key, or the hot keys collapsed early
    p should include("__salt")
    "HashAggregate".r.findAllIn(p).size should be >= 3 // partial+final ×2 phases
  }

  test("s5: centroid table broadcasts; corpus side never builds") {
    val p = plan("s5_label_noise")
    p should include("BroadcastHashJoin")
  }

  test("m3: frame-fingerprint self-join stays a shuffled hash join") {
    val p = plan("m3_frame_neardup")
    p should include("ShuffledHashJoin")
    val idxJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("fmd5")).toList
    idxJoins.filter(_.contains("BroadcastHashJoin")) shouldBe empty
  }

  test("t11: the benchmark gram set broadcasts; the corpus side probes") {
    val p = plan("t11_decontam")
    p should include("BroadcastHashJoin")
  }

  test("t13: the mixture-rate table broadcasts; the corpus side probes") {
    val p = plan("t13_mixture_sample")
    p should include("BroadcastHashJoin")
  }

  test("e16: the salt reaches the join keys (skew spread is real)") {
    val p = plan("e16_salted_join")
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("__salt")).toList
    joinLines should not be empty
  }

  test("t16: the top-V vocabulary is a top-k (no global sort) and broadcasts") {
    val p = plan("t16_vocab_coverage")
    p should include("TakeOrderedAndProject") // per-partition heaps, not Sort
    p should include("BroadcastHashJoin")     // V-row vocab probes map-side
  }

  test("s7: the per-dimension stats table broadcasts; the corpus side probes") {
    val p = plan("s7_quant_audit")
    p should include("BroadcastHashJoin")
  }

  test("g1: the static edge+degree frames are cached across rounds") {
    val p = plan("g1_pagerank")
    // without the persist every round re-runs the fact join + distinct
    p should include("InMemoryTableScan")
  }

  test("d15: the containment index self-join never broadcasts") {
    val p = plan("d15_containment")
    p should include("ShuffledHashJoin")
    // inner joins keyed on the shingle column are the index self-join;
    // the df-cap LeftAnti against the tiny hot list may broadcast
    val idxJoins = p.linesIterator.filter(l =>
      l.contains("Join [sh#") && l.contains("Inner")).toList
    idxJoins should not be empty
    idxJoins.filter(_.contains("BroadcastHashJoin")) shouldBe empty
  }

  test("t1/t5/d7: the text hot paths run on native kernels, not HOF lambdas") {
    plan("t1_lang_id") should include("graft_count_in")
    val t5 = plan("t5_winnowing")
    t5 should include("graft_shingle_seq")
    t5 should include("graft_winnow")
    plan("d7_intradoc_repeat") should include("graft_shingle_seq")
  }

  test("t10: the stopword-skew salt reaches both model-join keys") {
    val p = plan("t10_bigram_lm")
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("__salt")).toList
    joinLines.size should be >= 2 // bigram-count join AND context-count join
  }

  test("t10: the per-doc score is a plain sum — no per-doc array buffer") {
    // the fixed-point positional sum replaced the collect_list fold:
    // a pathological 10 MB document must not become a million-entry
    // aggregation buffer
    plan("t10_bigram_lm") should not include "collect_list"
  }

  test("t24: the boilerplate strip is join-free (two keyed aggs, no skew trap)") {
    // the strip decision is a function of the chunk key, so the plan
    // must be agg-only: joining hot boilerplate keys (df up to all
    // docs of a source) back to instances would be the classic skew
    // reducer
    val p = plan("t24_boilerplate")
    p.linesIterator.filter(_.contains("Join")).toList shouldBe empty
  }

  test("q21: the bloom probe filters the lineitem scan before the join") {
    val p = plan("q21_bloom_prefilter")
    p should include("graft_bloom_contains")
    // the probe must sit BELOW the semi join (scan-side pruning)
    p.indexOf("graft_bloom_contains") should be > p.indexOf("Join")
  }

  test("s6: centroid assignment broadcasts the k-row centroid table") {
    val p = plan("s6_kmeans")
    p should include("BroadcastNestedLoopJoin")
  }

  test("g2: adjacency-array joins stay shuffled; edge frame is cached") {
    // the adjacency frame is node-count rows of O(sqrt m) arrays —
    // broadcasting it at corpus scale would ship the whole graph to
    // every executor; the closure joins must stay shuffled hash
    val p = plan("g2_triangles")
    p should include("ShuffledHashJoin")
    val nbrsJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("nbrs")).toList
    nbrsJoins.filter(_.contains("BroadcastHashJoin")) shouldBe empty
    p should include("InMemoryTableScan") // edges reused via persist
  }

  test("s11: codebooks broadcast; corpus-keyed code joins do not build corpus") {
    // 8-row codebooks are the broadcast side by design; the 4 code
    // frames (corpus-sized) join on vec_id and must never be the
    // broadcast build side at scale — at sf0.001 AQE may still pick
    // broadcast for the tiny frames, so the lock here is only that
    // the codebook joins ARE broadcasts (the intended asymmetry).
    plan("s11_ivfpq_ann") should include("BroadcastHashJoin")
  }

  test("s18: the sign matrix broadcasts; the exploded corpus side probes") {
    val p = plan("s18_random_projection")
    p should include("BroadcastHashJoin")
  }

  test("s18: the audit sample is an absolute top-K and the pair side is unhinted") {
    // The distortion audit must not grow with the corpus: the sampled
    // ids are a hash-rank top-K (distributed per-partition heaps, no
    // global sort), and the O(K²) pair frame carries NO broadcast hint
    // — the only hinted broadcast in the plan is the 1024-row sign
    // matrix. A fractional sample + broadcast(pairs) is the shape that
    // kills the driver at 100× scale.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qe = SparkEntry.queries("s18_random_projection")(spark, dir)
      .queryExecution
    val hinted = qe.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    hinted should not be empty // the sign matrix IS hinted…
    hinted.foreach { j =>      // …and nothing else is
      val cols = (j.left.output ++ j.right.output).map(_.name)
      withClue(cols.mkString(","))(cols should contain("sgn"))
    }
    qe.executedPlan.toString should include("TakeOrderedAndProject")
  }

  test("e29: the touch join keys on the day bucket, not user_id alone") {
    // purchases ⋈ touches must carry the exploded t_day bucket in the
    // equi key — a user_id-only key makes one hot user a single
    // unbounded reducer with a quadratic pre-filter pair blow-up
    val p = plan("e29_multitouch")
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("t_day")).toList
    joinLines should not be empty
  }

  test("g2: the bucketed closure-input artifact kills every closure " +
      "exchange") {
    // the nv payload comes PRE-ATTACHED and src-bucketed from the
    // durable closure-input table (graft_g_edgenv), and the adjacency
    // groupBy(src) + nu attach read bucket-co-partitioned sides — so
    // the ONLY shuffle left in the whole plan is the per-node rollup
    // (round-12 same-window A/B: 2.80x sf3 / 1.45x sf10 warm). AQE
    // off for the count: query stages hide exchanges from traversal.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("g2_triangles")(spark, dir).queryExecution
      val shuffles = qe.executedPlan.collect { case e: ShuffleExchangeExec => e }
      withClue(qe.executedPlan.toString) {
        qe.executedPlan.toString should include("graft_g_edgenv")
        shuffles.size should be <= 1
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q33: no global sort anywhere (sorted zones come from bucketed ranks)") {
    val p = plan("q33_zonemap_skip")
    // the only acceptable Sort nodes are the final 2-row orderBy and
    // window-local sorts; a global Sort over lineitem would contain
    // the scan columns in a Sort [l_shipdate ... global
    p.linesIterator.filter(l => l.contains("Sort") && l.contains("global=true"))
      .filter(_.contains("l_orderkey")) shouldBe empty
  }

  test("g4: argmax is an aggregate, not a rank window") {
    // the per-node mode label is a max-of-struct partial+final agg;
    // a row_number window would funnel each dst-partition through a
    // sort. (The round's broadcast/no-exchange shape is locked in
    // Round9InvariantsSpec.auditLabelRound.)
    val p = plan("g4_label_prop")
    p should not include "row_number"
  }

  test("g5: a peel round plans with zero shuffle exchanges") {
    // both survivor frames broadcast into the src-bucketed repeat-
    // graph edge scan and the degree recount groups by the bucket
    // key, so a whole k-core round is exchange-free — the property
    // every one of g5's 12 rounds (and a production fixpoint loop's
    // unbounded rounds) rides on. AQE off for the count: query
    // stages hide exchanges from tree traversal.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = graft.queries.GraphQueries.auditPeelRound(spark, dir)
        .queryExecution
      val shuffles = qe.executedPlan.collect { case e: ShuffleExchangeExec => e }
      withClue(qe.executedPlan.toString) {
        qe.executedPlan.toString should include("graft_g_rep")
        shuffles shouldBe empty
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("s21: serving retrieval is cell-bounded — no corpus×query nested loop") {
    // The serving composition (IVF retrieval → MMR) must never scan
    // corpus×query: the only nested-loop join allowed is the k-row
    // query×centroid assignment; every corpus-touching join must be an
    // equi-join (on the cell label / qid / nid). s19's brute retrieval
    // plans a BroadcastNestedLoopJoin against the corpus — this lock
    // proves the serving path doesn't.
    val p = graft.queries.SimilarityQueries.s21ServingCand(spark, dir)
      .queryExecution.executedPlan.toString
    val nested = p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      .toList
    withClue(s"nested-loop joins beyond the centroid assignment:\n$p\n") {
      nested.size should be <= 1
    }
    // the corpus join keys on the cell label (hash-joinable equi key)
    val labelJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("label")).toList
    labelJoins should not be empty
  }

  test("s27: hybrid serving's dense leg is cell-bounded — no corpus×query nested loop") {
    // The production fusion must retrieve dense candidates from the
    // probed IVF cells only (the s21 lock applied to the fusion's
    // dense leg): the single allowed nested loop is the k-row
    // query×centroid assignment; the corpus joins on the cell label.
    val p = graft.queries.SimilarityQueries.s27ServingDense(spark, dir)
      .queryExecution.executedPlan.toString
    val nested = p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      .toList
    withClue(s"nested-loop joins beyond the centroid assignment:\n$p\n") {
      nested.size should be <= 1
    }
    val labelJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("label")).toList
    labelJoins should not be empty
  }

  test("s22: the frozen quantizer broadcasts; the arrival scan is one pass") {
    // index maintenance must be linear in the ARRIVAL batch: the only
    // non-equi join is the k-row centroid assignment (broadcast nested
    // loop); a second nested loop would mean a corpus-sized cross
    // stage crept into the audit aggregates.
    val p = plan("s22_index_maintain")
    p should include("BroadcastNestedLoopJoin")
    p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      .size should be <= 1
  }

  test("e33: the high-water pass never sorts the event stream globally") {
    // lateness = exclusive prefix-max over delivery order, computed as
    // per-day-bucket LOCAL windows + a broadcast cross-bucket max —
    // a global Sort over the delivery column would be the
    // single-reducer funnel the bucketed two-pass exists to avoid.
    // (The final 8-row orderBy(part) is the only global sort allowed.)
    val p = plan("e33_late_audit")
    p.linesIterator.filter(l => l.contains("Sort") && l.contains("global=true"))
      .filter(_.contains("delivery_us")) shouldBe empty
  }

  test("t28: the per-source totals broadcast; the vocab join stays keyed") {
    // ns (|sources| rows) and the 1-row corpus total broadcast into
    // the (source, word) term frame; the word-keyed sw⋈cw join must
    // remain an equi hash join — vocabulary is corpus-sized and must
    // never ride a nested loop.
    val p = plan("t28_mix_kl")
    p should include("BroadcastHashJoin")        // ns into terms, on source
    p should include("BroadcastNestedLoopJoin")  // the 1-row total
    p.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      .size should be <= 1
  }

  test("q22: the exact legs stay a SELECTION — no exact-percentile " +
      "aggregate, no full-table rank window") {
    // round 15 rewrote q22's exact percentiles from `percentile(x,p)`
    // (per-group whole-column aggregation buffers — the last
    // low-cardinality memory funnel, 28.3 s at sf3) to bucket-
    // histogram selection (4.0 s). Lock the shape: the plan may carry
    // percentile_approx (the audited sketch) but never the exact
    // Percentile aggregate, and its only windows are over the
    // broadcast-joined HOT buckets, never a full-table global rank.
    val p = plan("q22_approx_quantile")
    // the GK sketch + histogram passes ran eagerly at build time, so
    // the served plan reads their results as driver literals...
    p should include("LocalTableScan")
    // ...and never an exact-percentile aggregate
    p should not include "percentile(x"
    // the hot-bucket values ride a collect_list map, not a rank
    // window over the table; the only global sort is the final
    // #groups-row orderBy
    p should include("collect_list")
    p.linesIterator.filter(l => l.contains("Sort") &&
      l.contains("global=true")).size should be <= 1
  }

  test("t30: the weighted sample is one aggregator pass — no rank " +
      "window over the corpus") {
    // the K-smallest-keys selection must ride the mergeable O(K)
    // TopKAgg (ObjectHashAggregate), never a row_number window (which
    // would sort the whole corpus on one reducer for a global rank)
    val p = plan("t30_weighted_sample")
    p should include("ObjectHashAggregate")
    p should not include "Window"
  }

  test("no query plans an unpartitioned window (single-reducer funnel)") {
    // A Window with an empty partitionSpec requires AllTuples — every
    // row funnels through ONE task (Spark warns "No Partition Defined
    // ... single partition" at runtime). Turn that warning into a
    // regression gate across the whole declared surface. (Ordered
    // windows over metadata-scale frames, e.g. q20's per-bucket
    // offsets, are still partitioned — by group key — so they pass.)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.keys.foreach { q =>
      val lp = SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan
      val bad = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      withClue(q)(bad shouldBe empty)
    }
  }

  test("no query collects mid-plan (everything stays distributed)") {
    // structural: every declared query builds a DataFrame lazily; a
    // .collect() in an operator would have materialized at build time
    // and show up as a LocalRelation over >100 rows in q-scale plans.
    SparkEntry.queries.keys.foreach { q =>
      withClue(q)(noException should be thrownBy
        SparkEntry.queries(q)(spark, dir).queryExecution.optimizedPlan)
    }
  }
}
