package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.QueryPack.dot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s23's maintenance contract (round 14): the retrain trigger acts on
  * s22's drift metric, the FIRED branch lands bit-identically on the
  * from-scratch quantizer (so the serving plans and recall audits
  * apply verbatim to the maintained index), the HELD branch keeps the
  * frozen quantizer while still folding arrival occupancy, and the
  * maintained quantizer is durable — a fresh session attaches. */
class IvfMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** s2's serving plan, re-rooted on an explicit centroid table —
    * the re-audit must run against the MAINTAINED index, not the
    * session registry. */
  private def serve(cents: DataFrame): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val wAssign = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col("label"))
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("ccos",
        round(dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")), 6))
      .withColumn("crk", row_number().over(wAssign))
      .filter(col("crk") === 1)
      .select(col("qid"), col("qv"), col("qnorm"), col("label"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    assigned.join(e.as("b"), Seq("label"))
      .filter(col("qid") =!= col("b.vec_id"))
      .select(col("qid"), col("label"), col("b.vec_id").as("nid"),
        round(dot(col("qv"), col("b.v")) /
          (col("qnorm") * col("b.norm")), 6).as("cos"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("nid"), col("rk").cast("long").as("rk"))
  }

  private def recallOf(ann: Array[(Long, Long)]): Double = {
    val exact = SparkEntry.queries("s1_knn_brute")(spark, dir)
      .filter(col("rk") <= 3).select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.count(ann.toSet.contains).toDouble / exact.size
  }

  test("fired trigger: the maintained quantizer IS the from-scratch " +
      "retrain; the s2 serving plan and recall audit carry over verbatim") {
    val report = SparkEntry.queries("s23_ivf_retrain")(spark, dir).collect()
    report.foreach(_.getBoolean(5) shouldBe true) // agreement ~0.1 < 0.5
    // occupancy folded: every cell's n_total = n_base + n_new, arrivals present
    report.map(r => r.getLong(2)).sum should be > 0L
    report.foreach(r => r.getLong(3) shouldBe r.getLong(1) + r.getLong(2))

    // the durable maintained quantizer == the from-scratch
    // CentroidArtifacts quantizer (identical per-label means), so
    // every oracle-gated serving/recall result applies to it
    val table = SimilarityQueries.maintainedCentsTableName(dir)
    spark.catalog.tableExists(table) shouldBe true
    val maintained = spark.table(table)
      .select(col("cell").as("label"), col("cv"), col("cnorm"))
    val servedMaintained = serve(maintained)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val servedS2 = SparkEntry.queries("s2_ivf_ann")(spark, dir)
      .select(col("qid"), col("nid"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    servedMaintained shouldBe servedS2

    // the recall RE-AUDIT against the maintained index reproduces the
    // published s9-philosophy number and is non-vacuous
    val r = recallOf(servedMaintained.map(t => (t._1, t._2)))
    r shouldBe recallOf(servedS2.map(t => (t._1, t._2)))
    r should be > 0.0

    // a fresh session ATTACHES to the maintained quantizer
    val builds0 = graft.etl.DurableArtifacts.buildCount(table)
    val s2s = spark.newSession()
    val again = SimilarityQueries.s23Frames(s2s, dir, 0.5)._1.count()
    again shouldBe report.length.toLong
    graft.etl.DurableArtifacts.buildCount(table) shouldBe builds0
  }

  test("held trigger: below-bar drift keeps the frozen quantizer; " +
      "arrival occupancy still folds") {
    val (report, frozen, retrained) =
      SimilarityQueries.s23Frames(spark, dir, bar = 0.0)
    val rows = report.collect()
    rows.foreach(_.getBoolean(5) shouldBe false) // agreement >= 0 never < 0
    rows.foreach(r => r.getLong(3) shouldBe r.getLong(1) + r.getLong(2))
    // the quantizers genuinely differ (the shift column is the alarm
    // the next s22 pass would raise) — holding is a real decision
    val f = frozen.collect().map(r =>
      r.getAs[Any](0).toString -> r.getSeq[Double](1)).toMap
    val t = retrained.collect().map(r =>
      r.getAs[Any](0).toString -> r.getSeq[Double](1)).toMap
    f.keySet shouldBe t.keySet
    f.exists { case (k, v) => v != t(k) } shouldBe true
  }

  test("s26: the refine shortlist derives from cell occupancy by the " +
      "published integer formula, and adaptive refine never loses to " +
      "the pinned-R control") {
    // s26 row: (qid, n_cands, r_used, recall_adc, recall_refined, lift)
    val adaptive = SparkEntry.queries("s26_adaptive_refine")(spark, dir)
      .collect()
    // s24 row: (qid, n_cands, recall_adc, recall_refined, lift)
    val pinned = SparkEntry.queries("s24_pq_refine")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    adaptive should not be empty
    val floor = SimilarityQueries.s26RFloor
    val div = SimilarityQueries.s26CellDivisor
    adaptive.foreach { r =>
      val (qid, nCands, rUsed) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // occupancy = cell size including the query itself; R is the
      // exact single-sourced formula — max(floor, ceil(occ / div)) in
      // all-integer math, monotone in occupancy by construction
      val occ = nCands + 1
      rUsed shouldBe math.max(floor, (occ + div - 1) / div)
      // an adaptive shortlist with R >= the pinned 10 is a SUPERSET of
      // the pinned shortlist, and refine re-ranks by exact distance —
      // so its top-3 hit count can only match or beat the control
      rUsed should be >= floor
      r.getDouble(4) should be >= pinned(qid)
    }
  }
}
