package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-11 semantic invariants for the session's new queries —
  * cross-checks the DuckDB oracle can't express (it computes the same
  * SQL; these assert the MATH the results must obey regardless).
  */
class Round11InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("s22 index maintenance: every arrival routed exactly once " +
      "(occupancy conservation) and audit columns are internally consistent") {
    val rows = SparkEntry.queries("s22_index_maintain")(spark, sfDir).collect()
    rows.length should be > 0
    val nArrivals = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 5 === 0).count()
    rows.map(_.getLong(2)).sum shouldBe nArrivals // Σ n_new = |batch|
    rows.foreach { r =>
      val (nBase, nNew, nMatch) = (r.getLong(1), r.getLong(2), r.getLong(3))
      withClue(s"cell ${r.get(0)}: ") {
        nMatch should be <= nNew
        // growth is exactly n_new/n_base (recomputed independently)
        r.getDouble(4) shouldBe (BigDecimal(nNew.toDouble / nBase)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        if (nNew > 0) {
          val mc = r.getDouble(5)
          mc should (be >= -1.0 and be <= 1.0) // mean cosine range
        }
      }
    }
  }

  test("e33 watermark audit: head partition is never late, quantiles " +
      "are ordered, and event mass is conserved") {
    val rows = SparkEntry.queries("e33_late_audit")(spark, sfDir).collect()
    rows.length should be > 0
    val total = Tables(spark, sfDir, "events").count()
    rows.map(_.getLong(1)).sum shouldBe total // Σ n = |events|
    rows.foreach { r =>
      val (part, n, nLate) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (mx, p50, p99) = (r.getLong(4), r.getLong(5), r.getLong(6))
      withClue(s"part $part: ") {
        nLate should be <= n
        p50 should be <= p99
        p99 should be <= mx
        // partition 0 has zero transport lag and the source stream is
        // time-ordered, so it can never be late
        if (part == 0L) { nLate shouldBe 0L; mx shouldBe 0L }
      }
    }
  }

  test("t28 mixing KL: Gibbs inequality (KL >= 0 per source) and " +
      "token-mass conservation against the tokenized corpus") {
    val rows = SparkEntry.queries("t28_mix_kl")(spark, sfDir).collect()
    rows.length should be > 0
    val tokTotal = Tables(spark, sfDir, "documents")
      .select(expr("cast(size(split(text, ' ')) as long)").as("nw"))
      .agg(sum(col("nw"))).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == tokTotal) // Σ n_tokens = corpus
    rows.foreach { r =>
      withClue(s"source ${r.getString(0)}: ") {
        // fixed-point rounding can dip a hair below zero only when the
        // source ≈ the corpus mix; Gibbs otherwise
        r.getDouble(3) should be >= -1e-6
        // the argmax contribution of a non-identical source is positive
        r.getDouble(5) should be >= 0.0
      }
    }
  }
}
