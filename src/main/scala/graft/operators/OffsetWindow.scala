package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe ordered prefix sums — the cure for the two window
  * funnels PlanAuditSpec outlaws: an unpartitioned `Window.orderBy`
  * (one reducer for everything) and a low-cardinality
  * `partitionBy(k).orderBy(x)` (k reducers for the corpus, e.g. 3
  * returnflags or 20 sources).
  *
  * `prefixSum` computes, per group, the running `sum(weight)` in
  * `(bucket, order)` order WITHOUT a per-group sort: rows are
  * bucketed by a caller-supplied DETERMINISTIC expression that is
  * monotone in the intended order (`floor(x/1000)`, a leading hash
  * byte), local running sums run per (group, bucket) — thousands of
  * independent window partitions — and per-bucket totals (one row
  * per bucket per group, metadata-scale at any SF) turn into
  * prefix-sum offsets — a group-partitioned window when groups
  * exist (scales to any group cardinality), a broadcast triangular
  * join when they don't. Two fully parallel passes; bucket width is
  * the skew knob.
  *
  * The bucket expression must be deterministic — NOT
  * `repartitionByRange` partition ids, whose sampled boundaries can
  * disagree between the counts pass and the rank pass (measured;
  * see ROUND_NOTES).
  *
  * Row-number ranks are `weight = lit(1)`; q20's exact quantile
  * ranks and t14's sequence-packing token offsets are both this
  * operator.
  */
object OffsetWindow {

  /** Adds `out` = running sum of `weight` within each `groupCols`
    * group, ordered by (`bucket`, `order`), inclusive of the current
    * row. `bucket` must be monotone non-decreasing in (`order`) per
    * group OR independent of it only when ranks within a bucket
    * never cross buckets (hash buckets are valid when `order` starts
    * with the same hash — the t14 shape). */
  def prefixSum(df: DataFrame, groupCols: Seq[String], bucket: Column,
      order: Seq[Column], weight: Column, out: String): DataFrame = {
    // empty group list → one logical group; a lit partition key keeps
    // the offset window over the (tiny) bucket-count frame partitioned
    val gcols: Seq[Column] =
      if (groupCols.nonEmpty) groupCols.map(col) else Seq(lit(0).as("__g"))
    val gnames: Seq[String] =
      if (groupCols.nonEmpty) groupCols else Seq("__g")
    val t = df.withColumn("__bk", bucket)
      .withColumn("__w", weight.cast("long"))
    val base = if (groupCols.nonEmpty) t else t.withColumn("__g", lit(0))
    val counts = base.groupBy((gnames :+ "__bk").map(col): _*)
      .agg(sum(col("__w")).as("__c"))
    // Exclusive prefix sum over the per-bucket counts frame (one row
    // per (group, bucket)). Two regimes:
    //  - groupCols non-empty: a window PARTITIONED BY the group keys —
    //    already funnel-free (each group's ≤B bucket rows are one
    //    partition), and unlike a broadcast it scales to arbitrarily
    //    many groups. The offsets join stays unhinted so the planner
    //    broadcasts small frames and shuffles huge ones.
    //  - groupCols empty: the literal partition key constant-folds
    //    away, so a window would be the unpartitioned funnel
    //    PlanAuditSpec outlaws — use the TRIANGULAR broadcast
    //    self-join instead (B buckets ⇒ a trivia-sized B² pair join).
    val offsets =
      if (groupCols.nonEmpty) {
        val wOff = Window.partitionBy(gnames.map(col): _*)
          .orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        counts
          .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
          .drop("__c")
      } else {
        val joinCond = (gnames.map(n => col("a." + n) === col("b." + n)) :+
          (col("b.__bk") < col("a.__bk"))).reduce(_ && _)
        counts.as("a")
          .join(broadcast(counts.as("b")), joinCond, "left")
          .groupBy((gnames :+ "__bk").map(n => col("a." + n)): _*)
          .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
      }
    val wLoc = Window.partitionBy((gnames :+ "__bk").map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOff =
      if (groupCols.nonEmpty)
        base.withColumn("__lc", sum(col("__w")).over(wLoc))
          .join(offsets, gnames :+ "__bk")
      else
        base.withColumn("__lc", sum(col("__w")).over(wLoc))
          .join(broadcast(offsets), gnames :+ "__bk")
    withOff
      .withColumn(out, col("__off") + col("__lc"))
      .drop("__bk", "__lc", "__off", "__w")
      .drop((if (groupCols.nonEmpty) Nil else Seq("__g")): _*)
  }

  /** 1-based global rank of each row within its group, ordered by
    * (`bucket`, `order`) — `prefixSum` with unit weight. */
  def globalRank(df: DataFrame, groupCols: Seq[String], bucket: Column,
      order: Seq[Column], out: String): DataFrame =
    prefixSum(df, groupCols, bucket, order, lit(1L), out)

  /** Per-group running MAX of `value` over the rows STRICTLY BEFORE
    * the current one in (`bucket`, `order`) order — null when the row
    * has no predecessor. The dominance primitive behind sort-based
    * skylines (q28): a row beats everything before it iff
    * `value > out`. Same two-pass shape as [[prefixSum]]: local
    * EXCLUSIVE prefix max per (group, bucket) — thousands of
    * independent window partitions — plus a broadcast exclusive max
    * over the one-row-per-bucket maxima frame. `bucket` must be
    * monotone non-decreasing in (`order`) per group. */
  def prefixMaxExcl(df: DataFrame, groupCols: Seq[String], bucket: Column,
      order: Seq[Column], value: Column, out: String): DataFrame = {
    val gnames: Seq[String] =
      if (groupCols.nonEmpty) groupCols else Seq("__g")
    val t = df.withColumn("__bk", bucket).withColumn("__v", value)
    val base = if (groupCols.nonEmpty) t else t.withColumn("__g", lit(0))
    val maxima = base.groupBy((gnames :+ "__bk").map(col): _*)
      .agg(max(col("__v")).as("__m"))
    // Exclusive prefix max over the per-bucket maxima: same two
    // regimes as prefixSum — group-partitioned window (funnel-free,
    // unbounded group count) when groupCols is non-empty, triangular
    // broadcast self-join only for the empty case where a window
    // would be the unpartitioned funnel PlanAuditSpec outlaws.
    val offsets =
      if (groupCols.nonEmpty) {
        val wOff = Window.partitionBy(gnames.map(col): _*)
          .orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        maxima
          .withColumn("__off", max(col("__m")).over(wOff))
          .drop("__m")
      } else {
        val joinCond = (gnames.map(n => col("a." + n) === col("b." + n)) :+
          (col("b.__bk") < col("a.__bk"))).reduce(_ && _)
        maxima.as("a")
          .join(broadcast(maxima.as("b")), joinCond, "left")
          .groupBy((gnames :+ "__bk").map(n => col("a." + n)): _*)
          .agg(max(col("b.__m")).as("__off"))
      }
    val wLoc = Window.partitionBy((gnames :+ "__bk").map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff =
      if (groupCols.nonEmpty)
        base.withColumn("__lm", max(col("__v")).over(wLoc))
          .join(offsets, gnames :+ "__bk")
      else
        base.withColumn("__lm", max(col("__v")).over(wLoc))
          .join(broadcast(offsets), gnames :+ "__bk")
    withOff
      // greatest() skips nulls: null only when BOTH sides are empty,
      // i.e. the global first row
      .withColumn(out, greatest(col("__lm"), col("__off")))
      .drop("__bk", "__lm", "__off", "__v")
      .drop((if (groupCols.nonEmpty) Nil else Seq("__g")): _*)
  }
}
