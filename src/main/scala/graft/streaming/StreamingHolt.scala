package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the batch Holt smoother (e25_holt_trend in
  * [[graft.queries.EventsQueries]]): per-entity daily totals stream
  * in and each accepted day advances the (level, trend) pair with the
  * SAME IEEE operation sequence as the batch fold (α = β = ½ — the
  * halvings are exact, so the recursion rounds only in its
  * additions), emitting the one-step forecast after every step.
  * Batch/streaming parity is pinned in StreamingHoltSpec: the LAST
  * emission per entity is bit-identical to e25's row.
  *
  * Input contract: one record per (entity, day) — the nightly rollup
  * or an upstream windowed agg. Within a micro-batch records advance
  * in day order; a record whose day is ≤ the newest day already seen
  * for that entity is IGNORED (late redeliveries neither rescore nor
  * corrupt the recursion — at-least-once upstream delivery stays
  * safe).
  *
  * State story: one (lastDay, level, trend, nDays) quadruple per
  * entity — O(1); `stateTtlMs > 0` arms the usual processing-time
  * timeout, after which the recursion re-seeds from the next
  * observation (l = x, b = 0, the batch seed).
  */
object StreamingHolt {

  final case class DayTotal(entityId: Long, epochDay: Int, cents: Long)
  final case class Forecast(entityId: Long, epochDay: Int, nDays: Long,
      level: Double, trend: Double, forecast: Double)

  def smooth(daily: Dataset[DayTotal], stateTtlMs: Long = 0): Dataset[Forecast] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    daily.groupByKey(_.entityId)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(advance(stateTtlMs))
  }

  /** HALF_UP to 4 places — the same rounding Spark's round() applies
    * in the batch query (rint would be half-even). */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The per-entity transition — surfaced for TestGroupState specs.
    * State: (lastDay, level, trend, nDays) in CENTS (the exact
    * integer domain; /100 only at emission, like the batch query). */
  private[streaming] def advance(stateTtlMs: Long = 0)(
      entityId: Long, batch: Iterator[DayTotal],
      state: GroupState[(Int, Double, Double, Long)]): Iterator[Forecast] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var cur = state.getOption
    val out = Seq.newBuilder[Forecast]
    batch.toSeq.sortBy(_.epochDay).foreach { d =>
      if (cur.forall(_._1 < d.epochDay)) {
        val (l, b, n) = cur match {
          case None => (d.cents.toDouble, 0.0, 1L) // batch seed: l₁=x₁, b₁=0
          case Some((_, l0, b0, n0)) =>
            // the e25 recursion, verbatim IEEE order
            val lp = 0.5 * d.cents.toDouble + 0.5 * (l0 + b0)
            val bp = 0.5 * (lp - l0) + 0.5 * b0
            (lp, bp, n0 + 1)
        }
        cur = Some((d.epochDay, l, b, n))
        out += Forecast(entityId, d.epochDay, n,
          r4(l / 100), r4(b / 100), r4((l + b) / 100))
      } // day ≤ newest seen: late/duplicate delivery, ignored
    }
    cur.foreach(state.update)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }
}
