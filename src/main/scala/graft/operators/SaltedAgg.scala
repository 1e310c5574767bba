package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys.
  *
  * A plain `groupBy(k).agg(...)` shuffles every row of a hot key to
  * one reducer. Salting splits each key into `salt` subgroups for the
  * first (map-heavy) aggregation, then re-aggregates the tiny
  * partial-result table — the standard hot-key pattern when AQE skew
  * handling isn't enough (AQE only splits skewed JOIN partitions, not
  * aggregation groups).
  *
  * Works for any algebraic aggregate supplied as (partial, merge)
  * pairs; counts and sums compose exactly.
  */
object SaltedAgg {

  /** Arbitrary algebraic aggregates, salted: `partials` run per
    * (key, salt) in phase 1 (map-side combine fans each hot key over
    * `salt` reducers); `finals` merge the partial table — reference
    * partial aliases by name. Counts/sums/mins/maxes compose exactly;
    * pass sums as DECIMAL for float determinism (QueryPack rules). */
  def salted(df: DataFrame, salt: Int, keys: Seq[Column],
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(salt)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** count per key, salted. Result schema: (key..., cnt). */
  def saltedCount(df: DataFrame, salt: Int, keys: Column*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(salt)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** sum per key, salted. Result schema: (key..., total). */
  def saltedSum(df: DataFrame, value: Column, salt: Int, keys: Column*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(salt)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("total"))
  }
}
