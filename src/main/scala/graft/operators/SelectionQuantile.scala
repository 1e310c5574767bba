package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics as a SELECTION problem (round 16, factoring
  * the shape q22 proved out in round 15 so every rank read shares one
  * implementation).
  *
  * A quantile/percentile read needs the values at a handful of global
  * ranks per group — never a full ranking. The two standard Spark
  * shapes both overpay at scale: `percentile(x, p)` buffers every
  * group member in one aggregation buffer (the low-cardinality-group
  * memory funnel), and a full global rank (OffsetWindow.globalRank)
  * still SORTS the whole table to rank rows nobody asks about. The
  * selection plan instead:
  *
  *  1. one sortless scan builds a per-(group, value-bucket) histogram
  *     — map-side partial counts, metadata-scale output (~#buckets ×
  *     #groups rows to the driver);
  *  2. driver-side prefix sums over that histogram locate which
  *     bucket holds each wanted rank — the same driver-coordinated
  *     control plane as Spark's own `approxQuantile` and the q21
  *     bloom build, O(#buckets) memory at any SF;
  *  3. a second scan windows ONLY the located buckets (typically a
  *     few % of rows): local rank + the bucket's prefix offset is the
  *     exact global rank, and a broadcast join keeps just the wanted
  *     ranks.
  *
  * Callers that already scan for other per-(group, bucket) aggregates
  * (q22 fuses its sketch-audit counts into the histogram pass) hand
  * the collected histogram in via `histOpt` and pay no extra scan.
  *
  * 100 TB: every stage is partial+final or bucket-local; the only
  * sort is within located buckets (bucket width is the skew knob),
  * and nothing group-sized ever sits in one buffer or one reducer.
  */
object SelectionQuantile {

  /** Driver-histogram ceiling: the control plane collects one row per
    * (group, bucket), which is metadata-scale for the intended callers
    * (few groups × bounded buckets) but becomes a driver funnel if a
    * caller hands in a high-cardinality group column. Past this bound
    * the call FAILS FAST with the distributed alternative named,
    * instead of silently OOMing the driver. Env-tunable for callers
    * with a bigger driver ([[valuesAtRanks]] scaladoc). */
  @volatile private[graft] var maxHistRowsOverride: Option[Int] = None
  private[graft] def maxHistRows: Int = maxHistRowsOverride.getOrElse(
    sys.env.get("SPARK_GRAFT_SELECTION_MAX_HIST")
      .map(_.toInt).getOrElse(4_000_000))

  /** Values at caller-chosen 1-based global ranks per group.
    *
    * @param rows    input with columns `group` (string), `value`
    *                (numeric) and `bucket` (long, a deterministic
    *                monotone-in-value bucket id, e.g. floor(x/1000))
    * @param ranksOf the wanted 1-based ranks for a group of size n;
    *                every rank MUST lie in [1, n] (require()d per
    *                group — an out-of-range rank would otherwise be
    *                silently absent from the result and surface as a
    *                null far downstream)
    * @param histOpt pre-collected (group, bucket, count) rows from a
    *                caller-fused histogram scan; when absent one
    *                count-only scan runs here. Bounded by
    *                [[maxHistRows]] either way: #groups × #buckets
    *                beyond it needs the distributed form (keep the
    *                prefix sum on executors via
    *                [[OffsetWindow.prefixSum]] over the (group,
    *                bucket) counts, or widen the bucket function)
    * @return (frame of (group, rn, x) — one row per wanted rank —
    *         and the per-group sizes)
    */
  def valuesAtRanks(rows: DataFrame, group: String, value: String,
      bucket: String, ranksOf: Long => Seq[Long],
      histOpt: Option[Seq[(String, Long, Long)]] = None)
      : (DataFrame, Map[String, Long]) = {
    val s = rows.sparkSession
    import s.implicits._
    val hist: Seq[(String, Long, Long)] = histOpt.getOrElse {
      // limit BEFORE collect: the guard must bound the driver fetch
      // itself, not count what already blew the heap
      rows.groupBy(col(group), col(bucket)).agg(count(lit(1)).as("__c"))
        .limit(maxHistRows + 1)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
    }
    require(hist.size <= maxHistRows,
      s"SelectionQuantile driver histogram exceeds $maxHistRows " +
        "(group, bucket) rows — the driver-coordinated selection is " +
        "for metadata-scale histograms. Widen the bucket function, " +
        "reduce group cardinality, keep the prefix sum distributed " +
        "(OffsetWindow.prefixSum over the (group, bucket) counts), or " +
        "raise SPARK_GRAFT_SELECTION_MAX_HIST.")
    // one pass to group (not a filter per group — the control plane
    // must stay O(|hist|), not O(#groups × |hist|))
    val byGroup: Map[String, Seq[(String, Long, Long)]] = hist.groupBy(_._1)
    val ns: Map[String, Long] =
      byGroup.map { case (g, rs) => g -> rs.map(_._3).sum }
    val wanted: Map[String, Seq[Long]] =
      ns.map { case (g, n) =>
        val rs = ranksOf(n).distinct
        require(rs.forall(r => r >= 1 && r <= n),
          s"valuesAtRanks: ranks ${rs.filterNot(r => r >= 1 && r <= n)} " +
            s"out of [1, $n] for group '$g' — an out-of-range rank has " +
            "no locating bucket and would silently vanish from the result")
        g -> rs
      }
    // prefix sums locate each wanted rank's bucket; offsets ride along
    // so the located-bucket window can promote local ranks to global
    val located: Seq[(String, Long, Long)] =
      ns.keys.toSeq.sorted.flatMap { g =>
        val buckets = byGroup(g).sortBy(_._2)
        val offs = buckets.scanLeft(0L)(_ + _._3)
        val w = wanted(g)
        buckets.indices.collect { case i
          if w.exists(t => t > offs(i) && t <= offs(i) + buckets(i)._3) =>
          (g, buckets(i)._2, offs(i))
        }
      }
    val wantedRanks: Seq[(String, Long)] =
      wanted.toSeq.sortBy(_._1).flatMap { case (g, ws) => ws.map(g -> _) }
    val wLoc = Window.partitionBy(col(group), col(bucket)).orderBy(col(value))
    val vals = rows
      .join(broadcast(located.toDF(group, bucket, "__off")),
        Seq(group, bucket))
      .withColumn("__rn", row_number().over(wLoc).cast("long") + col("__off"))
      .join(broadcast(wantedRanks.toDF(group, "__rn")), Seq(group, "__rn"))
      .select(col(group), col("__rn").as("rn"), col(value).as("x"))
    (vals, ns)
  }

  /** The CUMULATIVE-COUNT rank read (e33's shape): when the value
    * domain is already aggregated to (value, cnt) rows with a running
    * `cum` and group total `n`, the value at rank ⌈(num/den)·n⌉ is
    * the smallest value whose cumulative count reaches it — exact
    * integer predicate, no float quantile math. Use inside the final
    * aggregation over the cumulated frame. */
  def pickAtFrac(value: Column, cum: Column, n: Column,
      num: Int, den: Int): Column =
    min(when(cum * den >= n * num, value))
}
