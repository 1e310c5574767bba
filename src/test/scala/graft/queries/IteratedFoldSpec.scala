package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintain loop ITERATED (round 14): b4 proves one fold equals
  * the full rebuild; production folds every day. Two successive
  * arrival batches are folded into the durable index state — each
  * fold an arrival-sized signature APPEND plus a star∪delta label
  * update off the PREVIOUS fold's labels — and the final state must
  * land exactly on b4's oracle-gated full-corpus result. This is the
  * induction step the daily loop rests on:
  * fold(fold(idx, Δ1), Δ2) ≡ rebuild(idx ∪ Δ1 ∪ Δ2). */
class IteratedFoldSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("two successive folds: appended index + twice-updated labels " +
      "equal the oracle-gated single-fold result") {
    val arrP = DedupQueries.isDeltaArrival(col("doc_id"))
    val b1P = col("doc_id") % 14 === 3 && col("doc_id") % 10 =!= 7
    val b2P = col("doc_id") % 7 === 3 && col("doc_id") % 14 =!= 3 &&
      col("doc_id") % 10 =!= 7
    val docs = graft.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 7).select(col("doc_id"))
    val sigs = DedupQueries.docSigs(spark, dir)
    val pairs = DedupQueries.d3PairsArtifact(spark, dir)
      .filter(col("d1") % 10 =!= 7 && col("d2") % 10 =!= 7)
      .select(col("d1"), col("d2"))
    def in(p: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      (c: String) => p(col(c))

    // durable signature index: written for the ingested index, then
    // APPENDED once per fold — three generations on ONE table
    val nb = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tbl = s"graft_b_itersigs_${graft.ArtifactRegistry.dirTag(dir)}"
    graft.etl.DurableArtifacts.bucketedTable(
      spark, tbl, nb, Seq("doc_id"), Seq("doc_id")) {
      sigs.filter(!arrP && col("doc_id") % 10 =!= 7)
    }
    val n0 = spark.table(tbl).count()
    def appendBatch(p: org.apache.spark.sql.Column): Unit = {
      graft.etl.DurableArtifacts.appendBucketed(spark, tbl, nb,
        Seq("doc_id"), Seq("doc_id"),
        alreadyFolded = cur => !cur.filter(p).isEmpty) {
        sigs.filter(p)
      }
      ()
    }
    appendBatch(b1P)
    val n1 = spark.table(tbl).count()
    appendBatch(b2P)
    val n2 = spark.table(tbl).count()
    n1 should be > n0
    n2 should be > n1
    n2 shouldBe sigs.filter(col("doc_id") % 10 =!= 7).count()
    // re-append of an already-folded batch is a guarded no-op
    appendBatch(b1P)
    spark.table(tbl).count() shouldBe n2

    // label fold, iterated: labels0 (index only) → fold Δ1 → fold Δ2
    def cc(edges: DataFrame, nodes: DataFrame): DataFrame =
      graft.operators.ConnectedComponents
        .run(edges, "d1", "d2", nodes, "doc_id")
        .select(col("id").as("doc_id"), col("cluster"))
    def star(labels: DataFrame): DataFrame =
      labels.filter(col("doc_id") =!= col("cluster"))
        .select(col("doc_id").as("d1"), col("cluster").as("d2"))
    val idxP = (c: String) =>
      !(col(c) % 7 === 3 && col(c) % 10 =!= 7) // non-arrival (non-bench)

    val labels0 = cc(
      pairs.filter(idxP("d1") && idxP("d2")),
      docs.filter(!arrP))
    // Δ1: pairs touching batch 1 with BOTH ends inside idx ∪ batch1
    val in1 = (c: String) => idxP(c) || in(_ % 14 === 3)(c)
    val d1Edges = pairs.filter(
      (in(_ % 14 === 3)("d1") || in(_ % 14 === 3)("d2")) &&
        in1("d1") && in1("d2"))
    val labels1 = cc(star(labels0).unionByName(d1Edges),
      docs.filter(!arrP || b1P))
    // Δ2: pairs touching batch 2 (universe now everything non-bench)
    val d2Edges = pairs.filter(
      in(_ % 14 =!= 3)("d1") && arrOf("d1") ||
        in(_ % 14 =!= 3)("d2") && arrOf("d2"))
    val labels2 = cc(star(labels1).unionByName(d2Edges), docs)

    // the induction lands on the oracle-gated b4 artifact exactly
    val got = labels2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = SparkEntry.queries("b4_index_fold")(spark, dir)
      .select(col("doc_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    got shouldBe want

    // non-vacuous: batch-2 edges exist, and at least one CROSS-BATCH
    // pair (batch2 ↔ batch1) merged clusters only the second fold
    // could have merged
    d2Edges.count() should be > 0L
    val cross = d2Edges.filter(
      (in(_ % 14 === 3)("d1") && in(_ % 14 =!= 3)("d2")) ||
        (in(_ % 14 =!= 3)("d1") && in(_ % 14 === 3)("d2"))).count()
    cross should be > 0L

    graft.etl.DurableArtifacts.drop(spark, tbl)
  }

  private def arrOf(c: String) =
    col(c) % 7 === 3 && col(c) % 10 =!= 7
}
