package graft

import org.apache.spark.sql.functions._

/** Driver-contract invariants over the whole query surface. */
class QueryContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query has an oracle unless explicitly sketch-based") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle shouldBe Set("q15_approx_hll") // HLL: rows-only by design
  }

  test("entry (flagship scoreboard) returns rows at sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name)(noException should be thrownBy fn(spark, sfDir).count())
    }
  }

  test("q15 HLL estimate stays within 5% of the exact distinct count") {
    val approx = SparkEntry.queries("q15_approx_hll")(spark, sfDir)
      .select(col("c_mktsegment"), col("approx_custs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (seg, n) =>
      val a = approx(seg)
      withClue(s"$seg approx=$a exact=$n") {
        math.abs(a - n).toDouble / n should be <= 0.05
      }
    }
  }
}
