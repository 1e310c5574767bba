package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.etl.CdcApply]]: a change log streams in
  * and the operator maintains each key's LIVE row, emitting one
  * update per accepted change — the incremental materialized-view
  * maintenance a serving table runs, where batch CdcApply is the
  * backfill. Same last-writer-wins contract: a change is accepted
  * only if its version is strictly newer than the key's current
  * state, so redeliveries and out-of-order stale versions are
  * swallowed (at-least-once upstream safe) — parity with the batch
  * operator over the same log is pinned in StreamingCdcSpec.
  *
  * Output contract: `Update(key, version, live, payload)` — `live =
  * false` marks a tombstone transition; a downstream sink applies
  * updates per key in version order (or just last-wins, which is the
  * same thing).
  *
  * State: one (version, live, payload) triple per key — the
  * streaming state IS the live table; `stateTtlMs > 0` arms the
  * usual processing-time TTL for keys gone quiet. By default expiry
  * DROPS the key entirely, so the next change — whatever its version
  * — re-seeds the row (retention semantics; stale redeliveries of a
  * long-dead key are accepted). When consumers need last-writer-wins
  * monotonicity to survive expiry, `retainVersionOnExpiry = true`
  * keeps a version HIGH-WATER residue instead: the payload is
  * cleared (the bulk of the state), the timeout is not re-armed, and
  * the few-bytes (version, live) marker lives on to swallow any
  * pre-expiry version forever — the compact watermark ledger a real
  * CDC consumer persists beside its store. The residue still lives
  * IN the state store, though; for monotonicity that survives
  * checkpoint resets / state retention sweeps too, pair the output
  * with the DURABLE ledger in [[CdcHighWater]] (a `foreachBatch`
  * filter-then-advance against a per-key high-water table).
  *
  * RECOMMENDED DEFAULT COMPOSITION (production): `stateTtlMs > 0` so
  * the state store stays bounded by the active key set, combined with
  * [[CdcHighWater.applyWithHighWater]] in the sink's `foreachBatch` so
  * last-writer-wins monotonicity survives expiry, checkpoint resets,
  * and state retention sweeps alike. Unbounded state (`stateTtlMs =
  * 0`) and `retainVersionOnExpiry` are the narrower alternatives —
  * use them only when no durable ledger location exists. The combined
  * lifecycle (TTL expiry → stale redelivery re-seed → ledger
  * suppression) is spec-pinned in StreamingCdcSpec's "recommended
  * composition" test. Operational note: run the composition under a
  * PERIODIC trigger (`Trigger.ProcessingTime(...)`) — with
  * ProcessingTimeTimeout armed, Spark's `shouldRunAnotherBatch` is
  * unconditionally true, so drain-style execution (`Trigger
  * .AvailableNow`, `processAllAvailable`) runs empty micro-batches
  * back-to-back forever, each paying a ledger rewrite.
  */
object StreamingCdc {

  final case class Change(key: Long, version: Long, op: String, payload: String)
  final case class Update(key: Long, version: Long, live: Boolean, payload: String)

  def upserts(changes: Dataset[Change], stateTtlMs: Long = 0,
      retainVersionOnExpiry: Boolean = false): Dataset[Update] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        advance(stateTtlMs, retainVersionOnExpiry))
  }

  /** The per-key transition — surfaced for TestGroupState specs. */
  private[streaming] def advance(stateTtlMs: Long = 0,
      retainVersionOnExpiry: Boolean = false)(
      key: Long, batch: Iterator[Change],
      state: GroupState[(Long, Boolean, String)]): Iterator[Update] = {
    if (state.hasTimedOut) {
      if (retainVersionOnExpiry) state.getOption match {
        case Some((v, live, _)) =>
          // shrink to the high-water residue; no timeout re-arm — the
          // marker is O(bytes) and outlives any retention window
          state.update((v, live, ""))
        case None => state.remove()
      }
      else state.remove()
      return Iterator.empty
    }
    var cur = state.getOption
    val out = Seq.newBuilder[Update]
    batch.toSeq.sortBy(_.version).foreach { c =>
      if (cur.forall(_._1 < c.version)) {
        val live = c.op != "D"
        cur = Some((c.version, live, c.payload))
        out += Update(key, c.version, live, c.payload)
      } // stale or duplicate version: swallowed
    }
    cur.foreach(state.update)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }
}
