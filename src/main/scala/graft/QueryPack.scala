package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of driver-contract queries plus their DuckDB oracle
  * SQL. `SparkEntry` concatenates all packs.
  *
  * Conventions that keep the Spark result hash-identical to the DuckDB
  * oracle (the driver sorts columns by name, then hashes values):
  *  - money/measure sums are computed in exact DECIMAL(18,2) arithmetic
  *    (cast BEFORE the sum, so parallel aggregation order can't change
  *    the result), rounded, then cast to DOUBLE for a canonical binary
  *    representation;
  *  - averages/ratios are derived from the exact decimal sum via double
  *    division + round (identical IEEE ops on identical inputs);
  *  - never emit a raw nanosecond timestamp (the events `ts` physical
  *    encoding varies by testdata generation; graft.Tables normalizes
  *    to µs) — cast to DATE or derive from `ts_ns div 1000` on the
  *    Spark side and `epoch_ns(ts)//1000` in DuckDB, both
  *    encoding-agnostic;
  *  - every result has a total deterministic ORDER BY (unique sort key)
  *    in both engines.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

object QueryPack {
  /** Exact decimal view of a 2-decimal money/measure column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Canonical output form for a decimal aggregate: round + double. */
  def money(c: Column): Column = round(c, 2).cast("double")

  /** Dot product via the native `graft_dot` expression (a codegen'd
    * primitive loop — see [[graft.functions.DotProduct]]). Spark's
    * `aggregate`/`zip_with` lambdas evaluate interpreted per element
    * and an unrolled 64-term sum blows up generated-code size; the
    * custom kernel is the Spark-native answer. Left-to-right
    * accumulation = identical IEEE order to a sequential fold (and to
    * DuckDB's list_sum over the zipped product). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Materialize a CONTROL-PLANE-SCALE frame (query samples, probe
    * routes, per-query scalars — k rows by construction, never
    * corpus-sized) into a LocalRelation. The audit queries reference
    * these tiny frames from several legs; left lazy, every reference
    * re-expands the frame's whole lineage into the plan (s29's
    * formatted plan reached 3,696 Exchange nodes) and AQE then
    * schedules each copy as its own stage chain. Collecting k rows
    * once and re-joining them as a local (broadcast-able) relation is
    * the s23/s30 "k-row answer localized" convention applied to
    * intermediates; downstream results are row-identical. */
  def localize(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** [[localize]] several INDEPENDENT k-row frames with their collect
    * actions submitted concurrently from driver threads (guide §2.6:
    * actions are only sequential because driver code calls them
    * sequentially; a later job's tasks back-fill executors freed by
    * the earlier job's tail). Callers must ensure every upstream the
    * frames SHARE is already materialized (registry artifact or
    * eagerly-counted cache) so concurrent jobs don't race a cache
    * fill. Each frame's content is unchanged — per-frame results are
    * byte-identical to sequential localize. */
  def localizePar(dfs: DataFrame*): Seq[DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = dfs.map(df => Future(localize(df)))
    futs.map(Await.result(_, Duration.Inf))
  }
}
