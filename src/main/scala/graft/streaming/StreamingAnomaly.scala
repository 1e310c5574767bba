package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the batch z-score sweep (e21_zscore_anomaly in
  * [[graft.queries.EventsQueries]]): per-entity daily totals stream
  * in and each new day is scored against the mean/stddev of that
  * entity's trailing 7 OBSERVED days — the continuous monitoring
  * twin of the batch audit, with the same exact-integer-cents
  * arithmetic so a flagged day here is bit-identical to the batch
  * flag (parity pinned in StreamingAnomalySpec).
  *
  * Input contract: one record per (entity, day) — the output of an
  * upstream windowed aggregation or the nightly rollup job. Within a
  * micro-batch records are processed in day order; a record whose day
  * is ≤ the newest day already seen for that entity is IGNORED (late
  * re-deliveries neither rescore nor corrupt the window — at-least-
  * once upstream delivery stays safe).
  *
  * State story: ≤ 7 (epochDay, cents) pairs per entity — O(1), no
  * unbounded growth; `stateTtlMs > 0` arms a processing-time timeout
  * so entities gone quiet release their window (the
  * StreamingNearDup TTL contract: after expiry the window rebuilds
  * from the next 7 observations).
  */
object StreamingAnomaly {

  final case class DayTotal(entityId: Long, epochDay: Int, cents: Long)
  final case class Anomaly(entityId: Long, epochDay: Int,
      observed: Double, mean7: Double, z: Double)

  def detect(daily: Dataset[DayTotal], stateTtlMs: Long = 0): Dataset[Anomaly] = {
    val spark = daily.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    daily.groupByKey(_.entityId)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(score(stateTtlMs))
  }

  /** The per-entity state transition — surfaced for TestGroupState
    * unit specs (the streaming-suite convention). Window buffer is
    * ascending by day, ≤ 7 entries. */
  private[streaming] def score(stateTtlMs: Long = 0)(
      entityId: Long, batch: Iterator[DayTotal],
      state: GroupState[List[(Int, Long)]]): Iterator[Anomaly] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var buf = state.getOption.getOrElse(Nil)
    val out = Seq.newBuilder[Anomaly]
    batch.toSeq.sortBy(_.epochDay).foreach { d =>
      if (buf.isEmpty || d.epochDay > buf.last._1) {
        if (buf.length == 7) {
          // identical IEEE sequence to the batch query: exact integer
          // Σx and Σx², then double mean/var/z
          val s = buf.iterator.map(_._2).sum
          val q = buf.iterator.map(c => c._2 * c._2).sum
          val mean = s.toDouble / 7
          val vr = q.toDouble / 7 - mean * mean
          if (vr > 0) {
            val z = (d.cents - mean) / math.sqrt(vr)
            // HALF_UP to 4 places — the same rounding Spark's round()
            // applies in the batch query (rint would be half-even)
            def r4(x: Double): Double =
              BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (math.abs(z) > 2)
              out += Anomaly(entityId, d.epochDay, d.cents.toDouble / 100,
                r4(mean / 100), r4(z))
          }
        }
        buf = (buf :+ (d.epochDay, d.cents)).takeRight(7)
      } // day ≤ newest seen: late/duplicate delivery, ignored
    }
    state.update(buf)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }
}
