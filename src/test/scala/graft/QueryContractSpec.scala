package graft

import org.apache.spark.sql.functions._

/** Driver-contract invariants over the whole query surface. */
class QueryContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle shouldBe empty
  }

  test("entry (flagship scoreboard) returns rows at sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name)(noException should be thrownBy fn(spark, sfDir).count())
    }
  }

  test("q15 HLL accuracy contract (est_ok) holds and exact counts match") {
    val rows = SparkEntry.queries("q15_approx_hll")(spark, sfDir)
      .select(col("c_mktsegment"), col("exact_custs"), col("est_ok"))
      .collect()
    rows should not be empty
    val exact = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      withClue(r.getString(0)) {
        r.getBoolean(2) shouldBe true
        r.getLong(1) shouldBe exact(r.getString(0))
      }
    }
  }
}
