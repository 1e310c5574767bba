package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 additions (g1 PageRank, s7
  * quantization audit, d14 edit-verified dedup, t15 TF-IDF, t16
  * vocabulary coverage) that the hash-vs-oracle gate can't express:
  * conservation laws, error bounds, and subset relations between
  * operators. */
class NewFamilyInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("g1: pagerank mass is conserved (sums to 1) and strictly positive") {
    val rows = SparkEntry.queries("g1_pagerank")(spark, sfDir)
      .select(col("pagerank")).collect().map(_.getDouble(0))
    rows should not be empty
    all(rows) should be > 0.0
    // rounded to 8 decimals per node; n nodes of absorbed rounding error
    rows.sum shouldBe 1.0 +- (rows.length * 1e-8)
  }

  test("g1: high-degree supplier nodes outrank the median customer") {
    val rows = SparkEntry.queries("g1_pagerank")(spark, sfDir).collect()
    val (supp, cust) = rows.partition(_.getLong(1) == 1L)
    supp should not be empty
    cust should not be empty
    // suppliers aggregate many customers' mass: their MEAN rank must
    // exceed the customers' (degree-weighted stationary distribution)
    val meanS = supp.map(_.getDouble(3)).sum / supp.length
    val meanC = cust.map(_.getDouble(3)).sum / cust.length
    meanS should be > meanC
  }

  test("s7: worst reconstruction error is bounded by half the largest step") {
    val step = Tables(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(((max(col("x")) - min(col("x"))).cast("double") / 255.0).as("st"))
      .agg(max(col("st"))).collect()(0).getDouble(0)
    val worst = SparkEntry.queries("s7_quant_audit")(spark, sfDir)
      .agg(max(col("max_abs_err"))).collect()(0).getDouble(0)
    worst should be <= step / 2 + 1e-9
  }

  test("d14: every verified pair is an LSH candidate and meets the sim bar") {
    val d14 = SparkEntry.queries("d14_edit_dedup")(spark, sfDir)
    val rows = d14.collect()
    rows.foreach { r =>
      withClue(s"${r.getLong(0)}-${r.getLong(1)}") {
        r.getLong(0) should be < r.getLong(1)
        r.getDouble(3) should be >= 0.8
      }
    }
    // subset of the d3 candidate set (same generator, stricter verify)
    val d3pairs = SparkEntry.queries("d3_minhash_lsh")(spark, sfDir)
      .select(col("d1"), col("d2"))
    // d14 admits pairs d3's 12/16 signature bar may reject, but any pair
    // with edit_sim ≥ 0.9 is a true near-dup the LSH index must also know:
    val strict = d14.filter(col("edit_sim") >= 0.95).select(col("d1"), col("d2"))
    strict.join(d3pairs, Seq("d1", "d2"), "left_anti").count() shouldBe 0L
  }

  test("t15: ranks are dense 1..k per source and the score formula holds") {
    val n = Tables(spark, sfDir, "documents").count()
    val rows = SparkEntry.queries("t15_tfidf")(spark, sfDir).collect()
    rows should not be empty
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      withClue(src) {
        rs.map(_.getLong(1)).sorted shouldBe (1L to rs.length).toArray
        rs.foreach { r =>
          r.getLong(3) should be >= 5L // tf support filter
          r.getDouble(5) shouldBe
            (r.getLong(3).toDouble * n / r.getLong(4)) +- 1e-6
        }
      }
    }
  }

  test("t16: OOV accounting is internally consistent") {
    val rows = SparkEntry.queries("t16_vocab_coverage")(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(r.getString(0)) {
        val (tok, oov) = (r.getLong(1), r.getLong(2))
        oov should be <= tok
        r.getLong(3) should be <= oov // distinct OOV types ≤ OOV tokens
        r.getDouble(4) shouldBe (oov.toDouble / tok) +- 1e-6
      }
    }
  }
}
