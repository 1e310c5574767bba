package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Forget.retractLabels]] — deleting keyed nodes from a cluster-
  * label view must equal a full CC rebuild on the surviving subgraph,
  * while recomputing ONLY components that lost a member; plus the
  * snapshot-retire Maintenance hook. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  // A graph exercising every retraction case:
  //  - chain 1-2-3 where 2 is a BRIDGE: forgetting 2 splits {1,3}
  //  - cluster {10,11,12} (star on 10) where 10 is the MIN-ID rep:
  //    forgetting 10 relabels to 11 (edges 11-12 survive via 10? no —
  //    star edges die with 10, so 11 and 12 split too unless directly
  //    linked; include the 11-12 edge so they stay one cluster)
  //  - cluster {20,21} untouched: rows must carry over verbatim
  //  - singleton 30 untouched; singleton 31 forgotten outright
  private val edges = Seq(
    (1L, 2L), (2L, 3L),
    (10L, 11L), (10L, 12L), (11L, 12L),
    (20L, 21L)).toDF("d1", "d2")
  private val nodes =
    Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 30L, 31L).toDF("doc_id")

  private def labelsOf(ns: Seq[Long], es: Seq[(Long, Long)]) =
    graft.operators.ConnectedComponents
      .run(es.toDF("d1", "d2"), "d1", "d2", ns.toDF("doc_id"), "doc_id")
      .select(col("id").as("doc_id"), col("cluster"))

  test("retraction equals a full rebuild on the surviving subgraph") {
    val labels = labelsOf(Seq(1, 2, 3, 10, 11, 12, 20, 21, 30, 31),
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)))
    val forget = Seq(2L, 10L, 31L).toDF("doc_id")
    // surviving pair evidence: edges with a forgotten endpoint die
    val survEdges = edges
      .filter(!col("d1").isin(2L, 10L, 31L) && !col("d2").isin(2L, 10L, 31L))
    val got = Forget.retractLabels(labels, survEdges, forget)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      1L -> 1L, 3L -> 3L,      // bridge forgotten -> component splits
      11L -> 11L, 12L -> 11L,  // min-id rep forgotten -> relabel to 11
      20L -> 20L, 21L -> 20L,  // untouched component, labels verbatim
      30L -> 30L)              // untouched singleton; 31 gone
    // full-rebuild equality (the b5 oracle identity, asserted locally)
    val rebuild = labelsOf(Seq(1, 3, 11, 12, 20, 21, 30),
      Seq((11L, 12L), (20L, 21L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe rebuild
  }

  test("untouched components never enter the recompute leg") {
    val labels = labelsOf(Seq(1, 2, 3, 20, 21),
      Seq((1L, 2L), (2L, 3L), (20L, 21L)))
    val forget = Seq(2L).toDF("doc_id")
    // hand the retraction POISONED evidence for untouched components:
    // if the pruning ever let {20,21} into the CC leg, this edge would
    // merge them with 1 and flip their labels — the q37 "affected
    // groups only" contract, tested by contradiction
    val poisoned = Seq((1L, 20L)).toDF("d1", "d2")
    val got = Forget.retractLabels(labels, poisoned, forget)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(20L) shouldBe 20L
    got(21L) shouldBe 20L
    got(1L) shouldBe 1L
    got(3L) shouldBe 3L
  }

  test("forgetting nothing returns the view unchanged") {
    val labels = labelsOf(Seq(1, 2, 3), Seq((1L, 2L)))
    val got = Forget.retractLabels(labels, edges,
      spark.emptyDataset[Long].toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
  }

  test("forgetting UN-SEES: a near-dup of a forgotten doc is admitted " +
      "once the streaming probe reseeds from the post-forget snapshot") {
    // The cascade's streaming edge: admission dedups against what was
    // SEEN, and a forget request must un-see — LSH state seeded from
    // the pre-forget index would keep suppressing near-dups of a doc
    // the pipeline is legally required to have deleted.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val index = Seq((100L, text), (200L, "totally unrelated words " * 8))
      .toDF("doc_id", "text")
    val arrival = (7003L, "srcA", text) // 16/16 signature match with 100

    def hitsAgainst(seed: org.apache.spark.sql.DataFrame): Set[Long] = {
      val in = MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamingAdmission
        .dupHits(in.toDF().toDF("doc_id", "source", "text"), seed)
        .writeStream.format("memory")
        .queryName(s"forget_reseed_${System.nanoTime()}")
        .outputMode("append").start()
      try {
        in.addData(arrival)
        q.processAllAvailable()
        spark.table(q.name).select(col("d1")).collect()
          .map(_.getLong(0)).toSet
      } finally q.stop()
    }

    // pre-forget seeds: the redelivery is suppressed as an index dup
    hitsAgainst(index) shouldBe Set(7003L)
    // post-forget seeds (index minus the forgotten doc): admitted
    hitsAgainst(index.filter(col("doc_id") =!= 100L)) shouldBe Set.empty
  }

  test("the pre-forget snapshot retires through the Maintenance artifact hook") {
    // the b5 lifecycle's final step: consumers switch to the post-
    // forget tables, then the OLD snapshot's managed-table trees drop
    // through Maintenance.run — by path, exactly how retired serving
    // copies go
    val t = s"graft_forgetspec_old_${System.nanoTime()}"
    DurableArtifacts.bucketedTable(spark, t, 2,
      Seq("doc_id"), Seq("doc_id")) {
      Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster")
    }.count() shouldBe 2L
    val loc = CorpusLayout.managedTablePath(spark, t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(loc) shouldBe true
    val r = Maintenance.run(spark, retiredArtifacts = Seq(loc.toString))
    r.artifactsDropped shouldBe Seq(loc.toString)
    fs.exists(loc) shouldBe false
    // the catalog entry goes with it (a fresh build-or-attach must
    // BUILD, not attach to a dangling location)
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
  }
}
