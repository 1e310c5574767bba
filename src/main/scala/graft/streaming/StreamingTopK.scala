package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous heavy hitters per group — the streaming twin of the
  * batch count-min sweep (q18_cms_heavy_hitters): a SpaceSaving
  * summary (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams") of fixed capacity `m` per group,
  * maintained in `flatMapGroupsWithState`, emitting the current
  * top-k after every micro-batch.
  *
  * SpaceSaving's contract, which the spec checks against exact
  * counts: each tracked item carries an overestimate `est` and the
  * error it inherited at adoption, with
  * `true ≤ est ≤ true + err` and `err ≤ N/m` (N = group's total
  * weight). A reported hitter is `guaranteed` when
  * `est − err ≥ est(k+1th)` — it provably belongs in the top-k
  * regardless of the error.
  *
  * State story: exactly ≤ m (item, est, err) triples per group —
  * O(m) forever, no growth with stream length; that bound is WHY
  * SpaceSaving (and not an exact count map) is the 100 TB shape.
  * `stateTtlMs > 0` arms a processing-time timeout that drops
  * summaries of quiet groups (the StreamingNearDup TTL contract).
  *
  * Determinism: batch items fold in (item) order, eviction takes the
  * minimum (est, item) pair, and the emitted top-k orders by
  * (est desc, item asc) — replays produce identical output.
  * Summaries are mergeable (add ests, cap at m by the same min
  * eviction) — the map-side-combine path if per-batch group volume
  * ever warrants a two-level fold; not needed at one state row per
  * group.
  */
object StreamingTopK {

  final case class Obs(group: String, item: Long, weight: Long)
  final case class HeavyHitter(group: String, item: Long,
      est: Long, err: Long, guaranteed: Boolean)

  /** item → (est, err) */
  private[streaming] type Summary = Map[Long, (Long, Long)]

  def topK(obs: Dataset[Obs], capacity: Int, k: Int,
      stateTtlMs: Long = 0): Dataset[HeavyHitter] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    obs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        update(capacity, k, stateTtlMs))
  }

  /** Per-group transition, surfaced for TestGroupState unit specs. */
  private[streaming] def update(capacity: Int, k: Int, stateTtlMs: Long = 0)(
      group: String, batch: Iterator[Obs],
      state: GroupState[Summary]): Iterator[HeavyHitter] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var s: Summary = state.getOption.getOrElse(Map.empty)
    batch.toSeq.sortBy(_.item).foreach { o =>
      s.get(o.item) match {
        case Some((est, err)) => s = s.updated(o.item, (est + o.weight, err))
        case None if s.size < capacity => s = s.updated(o.item, (o.weight, 0L))
        case None =>
          // adopt the minimum's count as inherited error (min (est, item)
          // — deterministic under ties)
          val (evict, (minEst, _)) = s.minBy { case (it, (est, _)) => (est, it) }
          s = (s - evict).updated(o.item, (minEst + o.weight, minEst))
      }
    }
    state.update(s)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    val ranked = s.toSeq
      .map { case (it, (est, err)) => (it, est, err) }
      .sortBy { case (it, est, _) => (-est, it) }
    // `guaranteed` compares against the largest count any item OUTSIDE
    // the reported top-k could have: the (k+1)-th est when one exists;
    // otherwise, if the summary is FULL (evictions may have occurred),
    // an untracked item can carry up to the summary's minimum est —
    // flooring at 0 there would overclaim. A non-full summary has
    // never evicted, so every unreported item truly has count 0.
    val floorK1 =
      if (ranked.size > k) ranked(k)._2
      else if (s.size == capacity && ranked.nonEmpty) ranked.last._2
      else 0L
    ranked.take(k).iterator.map { case (it, est, err) =>
      HeavyHitter(group, it, est, err, est - err >= floorK1)
    }
  }
}
