package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-14 late additions (s24 PQ
  * refine, t29 curriculum mixture schedule) that the hash-vs-oracle
  * gate can't express: apportionment conservation, schedule endpoint
  * identities, and the refine-dominance subset relation. sf0.01 —
  * big enough for every source/cell to be populated. */
class Round14InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("t29: every epoch's largest-remainder allocation sums to " +
      "exactly the 10k budget (no float reaches the manifest)") {
    val rows = SparkEntry.queries("t29_mix_schedule")(spark, sfDir)
      .groupBy(col("epoch")).agg(sum(col("alloc_tokens")).as("tot"))
      .collect()
    rows should have size 4
    rows.foreach(_.getLong(1) shouldBe 10000L)
  }

  test("t29: the final epoch lands on t12's temperature-flattened " +
      "target; earlier epochs interpolate monotonically") {
    val sched = SparkEntry.queries("t29_mix_schedule")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val t12 = SparkEntry.queries("t12_mix_weights")(spark, sfDir)
      .select(col("source"), col("temp_frac"), col("raw_frac"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // α = 4/4 = 1: epoch 4's share IS the flattened target (both
    // sides rounded to 6 at the same point)
    sched.filter(_._1 == 4L).foreach { case (_, src, share) =>
      share shouldBe t12(src)._1 +- 1e-6
    }
    // the interpolation is monotone per source: each epoch's share
    // moves from the natural distribution toward the target, never
    // overshooting or reversing
    sched.groupBy(_._2).foreach { case (src, byEpoch) =>
      val s = byEpoch.sortBy(_._1).map(_._3)
      val (_, raw) = t12(src)
      val up = t12(src)._1 >= raw
      s.zip(s.tail).foreach { case (a, b) =>
        if (up) b should be >= a - 1e-9 else b should be <= a + 1e-9
      }
    }
  }

  test("k4: vacuum preserves every as-of read at or after the " +
      "horizon bit-for-bit, forfeits reads before it, and drops " +
      "exactly the versions closed before the horizon") {
    import org.apache.spark.sql.DataFrame
    val full = LifecycleQueries.scd3ForSpec(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val horizon = to_timestamp(lit(LifecycleQueries.vacuumHorizon))
    val pruned = graft.etl.Scd2.vacuum(full, horizon)
    def asOf(t: String, d: DataFrame): Set[Seq[Any]] = {
      val ts = to_timestamp(lit(t))
      d.filter(col("validFrom") <= ts &&
          (col("validTo").isNull || col("validTo") > ts))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .collect().map(_.toSeq).toSet
    }
    // the retention window: reads at/after the horizon are identical
    Seq("2024-02-15 00:00:00", "2024-02-20 00:00:00",
        "2024-03-01 00:00:00", "2024-06-01 00:00:00").foreach { t =>
      asOf(t, pruned) shouldBe asOf(t, full)
    }
    // forfeited: a pre-horizon read demonstrably lost rows
    asOf("2024-01-15 00:00:00", pruned).size should be <
      asOf("2024-01-15 00:00:00", full).size
    // accounting: dropped == versions with validTo < horizon, and
    // both retained-closed and dropped-closed versions exist (the
    // horizon genuinely splits the closed history)
    val dropped = full.count() - pruned.count()
    dropped shouldBe full.filter(col("validTo") < horizon).count()
    dropped should be > 0L
    pruned.filter(col("validTo").isNotNull).count() should be > 0L
    full.unpersist(blocking = false)
    ()
  }

  test("g6: BFS respects the bipartite structure — customers on " +
      "even hops, suppliers on odd — and every hop level 0..3 is " +
      "populated") {
    val rows = SparkEntry.queries("g6_reachability")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    rows.foreach { case (hops, n, nCust) =>
      n should be > 0L
      // the repeat-business graph is customer↔supplier bipartite on
      // the doubled-id encoding: a frontier alternates sides exactly
      if (hops % 2 == 0) nCust shouldBe n else nCust shouldBe 0L
    }
  }

  test("s24: exact re-rank of the ADC shortlist never loses a hit " +
      "the raw ADC ranking had (refine dominance), and recall stays " +
      "in [0, 1]") {
    val rows = SparkEntry.queries("s24_pq_refine")(spark, sfDir).collect()
    rows.length shouldBe 10
    rows.foreach { r =>
      val (adc, ref) = (r.getDouble(2), r.getDouble(3))
      adc should be >= 0.0
      ref should be <= 1.0
      // an ADC-top-3 member that is a true neighbor is in the
      // shortlist with an exact rank <= 3, so the refined top-3
      // keeps it: hits can only be added, never dropped
      ref should be >= adc
      // lift, recall_adc and recall_refined are each rounded to 6
      // decimals independently — reconcile at that granularity
      r.getDouble(4) shouldBe (ref - adc) +- 2e-6
    }
  }
}
