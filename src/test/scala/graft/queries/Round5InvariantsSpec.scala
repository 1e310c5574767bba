package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-5 additions that the
  * hash-vs-oracle gate can't express: independent recomputation
  * (q32 against Spark's own regr_slope), dominance and accounting
  * laws (q33, m6, q35), concentration (s18), conservation (g4) and
  * coverage (t22). */
class Round5InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q32: closed-form OLS matches Spark's built-in regr_slope/intercept") {
    val ours = SparkEntry.queries("q32_linreg")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE))").as("sl"),
        expr("regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE))").as("ic"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ours.keySet shouldBe ref.keySet
    ours.foreach { case (rf, (sl, ic)) =>
      withClue(s"rf=$rf: ") {
        sl shouldBe ref(rf)._1 +- math.abs(ref(rf)._1) * 1e-6
        ic shouldBe ref(rf)._2 +- math.abs(ref(rf)._2) * 1e-6
      }
    }
  }

  test("q33: pruning is sound and the sorted layout dominates raw") {
    val rows = SparkEntry.queries("q33_zonemap_skip")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val (rawT, rawS, rawRows, rawMatch, rawSound) = rows("raw")
    val (srtT, srtS, srtRows, srtMatch, srtSound) = rows("sorted")
    rawSound shouldBe true
    srtSound shouldBe true
    rawMatch shouldBe srtMatch // same predicate, same table
    srtRows should be <= rawRows // sorting can only improve skipping
    srtRows should be >= srtMatch // scanned covers every match
    srtS should be <= srtT
    rawS should be <= rawT
  }

  test("q34: sketch estimates degrade to exact when the union fits in k") {
    // sf0.001 cohorts are < 256 distinct keys: kk < k branch → exact
    val r = SparkEntry.queries("q34_kmv_setalgebra")(spark, sfDir).collect().head
    val (nu, ni) = (r.getLong(2), r.getLong(3))
    if (nu <= 256) {
      r.getDouble(5) shouldBe nu.toDouble +- 1e-6 // union_est
      r.getDouble(7) shouldBe ni.toDouble +- 1e-4 // intersect_est
      r.getBoolean(8) shouldBe true
    }
  }

  test("q35: statuses partition the key space and deltas reconcile") {
    val byStatus = SparkEntry.queries("q35_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def view(lo: String, hi: String) = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
        col("l_shipdate") < lit(hi).cast("timestamp"))
      .select(col("l_orderkey")).distinct()
    val v1 = view("1996-07-01", "1997-01-01")
    val v2 = view("1997-01-01", "1997-07-01")
    val nKeys = v1.unionByName(v2).distinct().count()
    byStatus.values.map(_._1).sum shouldBe nKeys
    byStatus.getOrElse("same", (0L, 0L))._2 shouldBe 0L // same → zero delta
    // net item deltas across statuses reconcile to |v2 items| − |v1 items|
    val n1 = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp")).count()
    val n2 = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp")).count()
    byStatus.values.map(_._2).sum shouldBe (n2 - n1)
  }

  test("e28: journey motif counts are bounded by event counts") {
    val rows = SparkEntry.queries("e28_pattern_match")(spark, sfDir).collect()
    val nUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    rows.map(_.getLong(2)).sum shouldBe nUsers // distribution covers everyone
    val nPurch = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    // each conversion consumes a distinct purchase char
    rows.map(r => r.getLong(0) * r.getLong(2)).sum should be <= nPurch
  }

  test("s17: profile stats bound every embedding value") {
    val rows = SparkEntry.queries("s17_embed_profile")(spark, sfDir).collect()
    rows.length shouldBe 64
    rows.foreach { r =>
      val (mean, std, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      mn should be <= mean
      mean should be <= mx
      std should be >= 0.0
      std should be <= (mx - mn) // Popoviciu: σ ≤ range/2 ≤ range
    }
  }

  test("s18: JL ratios concentrate (majority within 3 sigma, mean near 1)") {
    val rows = SparkEntry.queries("s18_random_projection")(spark, sfDir).collect()
    rows should not be empty
    val ratios = rows.map(_.getDouble(2))
    val within = rows.count(_.getBoolean(3))
    within.toDouble / rows.length should be >= 0.75
    (ratios.sum / ratios.length) shouldBe 1.0 +- 0.5
  }

  test("k3: boundary instant belongs to the new version; cohorts shift") {
    // sf0.01: the k1/k3 snapshot thresholds (keys 300/1200) need the
    // 1500-customer table — at sf0.001 snapshot 2 would be empty
    val sfDir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("k3_time_travel")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // SEG_MOVED exists exactly from the 2024-02-01 merge boundary on
    rows.keys.filter(_._2 == "SEG_MOVED").map(_._1).toSet shouldBe
      Set("2024-02-01 00:00:00", "2024-02-15 00:00:00")
    // total membership: snapshot1 keys before, snapshot2 keys at/after
    val before = rows.collect { case ((t, _), n) if t.startsWith("2024-01") => n }.sum
    val after = rows.collect { case ((t, _), n) if t == "2024-02-15 00:00:00" => n }.sum
    val cust = Tables(spark, sfDir, "customer")
    before shouldBe cust.filter(col("c_custkey") <= 1200).count()
    after shouldBe cust.filter(col("c_custkey") > 300).count()
  }

  test("t22: chunks tile every document (full token coverage, stride grid)") {
    val chunks = SparkEntry.queries("t22_chunking")(spark, sfDir).collect()
    val perDoc = chunks.groupBy(_.getLong(0))
    val docToks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.head.getLong(2) shouldBe 0L // first chunk starts at 0
      sorted.foreach(c => c.getLong(2) shouldBe c.getLong(1) * 48) // grid
      // last chunk reaches the document end
      val last = sorted.last
      last.getLong(2) + last.getLong(3) shouldBe docToks(doc)
    }
  }

  test("m6: block accounting is exact (dups + distinct = total, savings bounded)") {
    val rows = SparkEntry.queries("m6_block_dedup")(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (total, distinct, dups, saved) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      distinct + dups shouldBe total
      saved should be <= dups * 256L
      saved should be >= 0L
    }
  }

  test("g4: community sizes conserve the node count") {
    val dist = SparkEntry.queries("g4_label_prop")(spark, sfDir).collect()
    val nodes = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val nNodes = nodes.select(col("ck")).distinct().count() +
      nodes.select(col("sk")).distinct().count()
    dist.map(r => r.getLong(0) * r.getLong(1)).sum shouldBe nNodes
  }

  test("e29: attributed revenue reconciles to total purchase revenue") {
    val rows = SparkEntry.queries("e29_multitouch")(spark, sfDir).collect()
    val attributed = rows.map(_.getDouble(2)).sum
    val total = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum((round(col("value").cast("decimal(18,2)"), 2) * 100)
        .cast("long"))).collect().head.getLong(0)
    // per-touch micro-rounding absorbs ≤ 1e-6 per touch
    attributed shouldBe (total.toDouble / 100) +- 0.01
  }

  test("t23: the greedy fill commits exactly the budget") {
    val rows = SparkEntry.queries("t23_token_budget")(spark, sfDir).collect()
    val budget = rows.head.getLong(5)
    val committed = rows.map(r => r.getLong(2) * r.getDouble(7)).sum
    committed shouldBe budget.toDouble +- rows.length * 1e-6 * 2000
    // included prefix is contiguous in rank order
    val inc = rows.sortBy(_.getLong(1)).map(_.getBoolean(6))
    inc.dropWhile(identity).exists(identity) shouldBe false
  }

  test("q31: the maintained view equals the monolithic join-aggregate") {
    val maintained = SparkEntry.queries("q31_incr_join")(spark, sfDir)
    val monolithic = {
      import graft.QueryPack.{dec, money}
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          money(sum(dec(col("l_extendedprice")) *
            (lit(1) - dec(col("l_discount"))))).as("revenue"))
        .filter(col("n_items") >= 20)
    }
    maintained.exceptAll(monolithic).count() shouldBe 0L
    monolithic.exceptAll(maintained).count() shouldBe 0L
  }
}
