package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 3 join keys only (cardinality << parallelism), one of them hot
  private lazy val big = (
    (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 200).map(i => ("warm", i.toLong)) ++
      (1 to 7).map(i => ("cold", i.toLong))
    ).toDF("k", "v").repartition(8)

  private lazy val dim =
    Seq(("hot", 10.0), ("warm", 2.0), ("cold", 0.5), ("unmatched", 9.9))
      .toDF("k", "w")

  test("salted inner join equals plain inner join") {
    val plain = big.join(dim, Seq("k"))
      .select($"k", $"v", $"w")
      .as[(String, Long, Double)].collect().toSeq.sorted
    val salted = SaltedJoin.inner(big, dim, Seq("k"), salts = 8, saltBy = $"v")
      .select($"k", $"v", $"w")
      .as[(String, Long, Double)].collect().toSeq.sorted
    salted shouldBe plain
  }

  test("salt participates in the join keys (plan-level)") {
    val joined = SaltedJoin.inner(big, dim, Seq("k"), salts = 8, saltBy = $"v")
    val plan = joined.queryExecution.optimizedPlan.toString
    plan should include("__salt")
  }

  test("left_outer preserves unmatched big rows exactly once") {
    val bigPlus = big.union(Seq(("orphan", 1L), ("orphan", 2L)).toDF("k", "v"))
    val plain = bigPlus.join(dim, Seq("k"), "left_outer")
      .select($"k", $"v", $"w")
      .as[(String, Long, Option[Double])].collect().toSeq.sorted
    val salted = SaltedJoin(bigPlus, dim, Seq("k"), salts = 8,
        saltBy = $"v", joinType = "left_outer")
      .select($"k", $"v", $"w")
      .as[(String, Long, Option[Double])].collect().toSeq.sorted
    salted shouldBe plain
  }

  test("small-side-preserving join types are rejected") {
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin(big, dim, Seq("k"), 8, $"v", "right_outer")
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin(big, dim, Seq("k"), 8, $"v", "full_outer")
  }

  test("salts=1 degenerates to the plain join") {
    val one = SaltedJoin.inner(big, dim, Seq("k"), salts = 1, saltBy = $"v")
    one.count() shouldBe big.join(dim, Seq("k")).count()
  }
}
