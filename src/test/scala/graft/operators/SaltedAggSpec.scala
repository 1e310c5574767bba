package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: one hot key with 10k rows, 50 cold keys
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 50).flatMap(k => (1 to 3).map(i => (s"cold$k", i.toLong)))
    ).toDF("k", "v").repartition(8)

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val salted = SaltedAgg.saltedCount(skewed, salt = 16, $"k")
      .orderBy("k").as[(String, Long)].collect().toSeq
    salted shouldBe plain
  }

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed.groupBy($"k").agg(sum($"v").as("total"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val salted = SaltedAgg.saltedSum(skewed, $"v", salt = 16, $"k")
      .orderBy("k").as[(String, Long)].collect().toSeq
    salted shouldBe plain
  }

  test("first phase actually fans the hot key out across salt groups") {
    val salted = skewed.withColumn("__salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(16)))
    val groups = salted.filter($"k" === "hot")
      .groupBy($"k", $"__salt").count().count()
    groups should be > 1L
  }
}
