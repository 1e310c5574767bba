package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BoundedPairs]]: the chunk guard must change WHERE pairs are
  * computed, never WHICH pairs come out. */
class BoundedPairsSpec extends SparkSpec {
  import spark.implicits._

  test("pair set identical to the naive self-join, each pair exactly once") {
    // one dominant group (200 rows) + one small group (20 rows):
    // the degenerate-cluster shape d8's guard exists for
    val df = ((0 until 200).map(i => ("big", i.toLong)) ++
      (1000 until 1020).map(i => ("small", i.toLong))).toDF("g", "id")
    val out = BoundedPairs.withinGroupPairs(df, "g", "id", maxCell = 32)
      .select(col("a.g").as("g"), col("a.id").as("id1"), col("b.id").as("id2"))
    out.count() shouldBe (200L * 199 / 2 + 20L * 19 / 2)
    out.distinct().count() shouldBe out.count() // no pair twice
    out.filter(col("id1") >= col("id2")).count() shouldBe 0L
  }

  test("dominant group spreads across chunk keys (join stays subquadratic)") {
    val df = (0 until 200).map(i => ("big", i.toLong)).toDF("g", "id")
    val joined = BoundedPairs.withinGroupPairs(df, "g", "id", maxCell = 32)
    // the physical join must key on the chunk column, not the group
    // alone — with 200 rows and maxCell=32 there are 7 chunks, so no
    // single join key sees more than ~n·maxCell candidates
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("__t")
    plan should include("ShuffledHashJoin")
    // b-side chunk population is balanced-ish: every chunk non-empty
    val chunks = df
      .withColumn("__t", pmod(xxhash64(col("id")), lit(7)).cast("int"))
      .groupBy("__t").count().collect()
    chunks.length shouldBe 7
    chunks.map(_.getLong(1)).max.toInt should be < 60 // ≪ 200
  }

  test("crossGroupPairs: same pairs as the plain group join, same-id dropped") {
    // dominant index cell (150 rows) + small one; delta overlaps one id
    val index = ((0 until 150).map(i => ("big", i.toLong)) ++
      (500 until 520).map(i => ("small", i.toLong))).toDF("g", "id")
    val delta = Seq(("big", 7L), ("big", 1000L), ("small", 505L), ("none", 1L))
      .toDF("g", "id")
    val out = BoundedPairs.crossGroupPairs(delta, index, "g", "id", maxCell = 32)
      .select(col("a.id").as("d"), col("b.id").as("i"))
    val expected = delta.as("l").join(index.as("r"), Seq("g"))
      .filter(col("l.id") =!= col("r.id"))
      .select(col("l.id").as("d"), col("r.id").as("i"))
    out.count() shouldBe expected.count()
    out.except(expected).count() shouldBe 0L
    expected.except(out).count() shouldBe 0L
    out.distinct().count() shouldBe out.count() // each pair exactly once
    // the re-crawled id (7 in big, 505 in small) never pairs with itself
    out.filter(col("d") === col("i")).count() shouldBe 0L
    // chunk key reaches the physical join
    BoundedPairs.crossGroupPairs(delta, index, "g", "id", 32)
      .queryExecution.executedPlan.toString should include("__t")
  }

  test("groups at or under maxCell pay zero replication") {
    val df = (0 until 10).map(i => ("g", i.toLong)).toDF("g", "id")
    val out = BoundedPairs.withinGroupPairs(df, "g", "id", maxCell = 32)
    out.count() shouldBe 45L
    // m = 1 → the a-side explode emits exactly one row per input row
    val aSide = df.join(
        broadcast(df.groupBy("g").agg(count(lit(1)).as("__n"))
          .withColumn("__m", greatest(lit(1),
            ceil(col("__n") / lit(32.0)).cast("int")))
          .select("g", "__m")), Seq("g"))
      .withColumn("__t", explode(sequence(lit(0), col("__m") - 1)))
    aSide.count() shouldBe 10L
  }
}
