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

  test("generic salted() composes count/sum/min/max exactly, random data") {
    val rng = new scala.util.Random(23)
    val data = (1 to 3000).map { _ =>
      (s"k${rng.nextInt(4)}", rng.nextInt(1000).toLong) // 4 keys: all hot
    }.toDF("k", "v").repartition(8)
    val plain = data.groupBy($"k").agg(
      count(lit(1)).as("n"), sum($"v").as("s"), min($"v").as("mn"), max($"v").as("mx"))
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    val salted = SaltedAgg.salted(data, salt = 16, keys = Seq($"k"),
      partials = Seq(count(lit(1)).as("__n"), sum($"v").as("__s"),
        min($"v").as("__mn"), max($"v").as("__mx")),
      finals = Seq(sum($"__n").as("n"), sum($"__s").as("s"),
        min($"__mn").as("mn"), max($"__mx").as("mx")))
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
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
