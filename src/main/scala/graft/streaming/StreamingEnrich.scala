package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream enrichment: join an event stream with a
  * dimension-UPDATE stream (roster changes, goal edits, price
  * updates) inside a bounded event-time window — the streaming form
  * of the reference's "look up the dimension row for each fact"
  * step when the dimension itself arrives as a stream rather than a
  * table.
  *
  * Semantics: an event matches every dimension update for its key
  * whose time lies in `[event.time − lookback, event.time]` — all
  * in-window versions are emitted, each carrying its update time.
  * This is deliberately NOT "latest only": exact as-of over two
  * unbounded streams needs unbounded state (a later batch can always
  * deliver a closer update), while the window form lets Spark bound
  * BOTH join states by watermark — the documented stream-stream
  * pattern. Downstream picks max(dimTime) per event in foreachBatch
  * (or batch AsOfJoin at rest) when single-version semantics matter.
  *
  * State story: both sides carry `delay` watermarks and the join
  * condition carries the time bounds, so each side's buffered rows
  * are dropped once the other side's watermark passes their
  * eligibility window — state is O(traffic in lookback + delay), not
  * O(stream). Left-outer keeps events with no in-window update
  * (emitted with nulls once the watermark proves none can arrive).
  */
object StreamingEnrich {

  /** @param events   streaming frame with `eventsKey` and `eventsTime`
    * @param updates  streaming frame with `updatesKey` and `updatesTime`
    *                 (column names must be disjoint from `events` —
    *                 alias first, the AsOfJoin convention)
    * @param lookback how far back an update may be, e.g. "1 hour"
    * @param delay    max out-of-orderness per side (watermark delay)
    */
  def recentJoin(events: DataFrame, updates: DataFrame,
      eventsKey: String, updatesKey: String,
      eventsTime: String, updatesTime: String,
      lookback: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    val e = events.withWatermark(eventsTime, delay)
    val u = updates.withWatermark(updatesTime, delay)
    val cond: Column =
      col(eventsKey) === col(updatesKey) &&
        col(updatesTime) >= col(eventsTime) - expr(s"INTERVAL $lookback") &&
        col(updatesTime) <= col(eventsTime)
    e.join(u, cond, joinType)
  }
}
