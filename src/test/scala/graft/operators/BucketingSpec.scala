package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed tables co-locate join keys at write time — the repeated-
  * join shuffle disappears (SURVEY "partitioning & shuffle": bucketing
  * for co-located joins). This spec proves the plan shape: a join of
  * two tables bucketed on the key has NO shuffle exchange. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse dir is a temp dir set by SparkSpec (static conf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    val orders = (1L to 1000L).map(k => (k, s"o$k")).toDF("okey", "o_payload")
    val lines = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("okey", "line_id")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
    joined.count() shouldBe 5000

    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "Exchange hashpartitioning"
    // sanity: the same join over non-bucketed frames DOES shuffle
    // (disable auto-broadcast so the small side isn't broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unbucketed = orders.join(lines, "okey")
      unbucketed.queryExecution.executedPlan.toString should
        include("Exchange hashpartitioning")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
