package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact ledger semantics of the reference's DynamoDB conditional put
  * (SURVEY §2.4 D2; `docs/dynamodb_schema.md`): first event for a key
  * within the TTL window is admitted and the ledger records `seenAt`;
  * later duplicates are dropped; once the event-time watermark passes
  * `seenAt + ttl`, state is freed and the key readmits.
  *
  * `dropDuplicatesWithinWatermark` (see [[graft.etl.Dedup]]) is the
  * idiomatic form; this `flatMapGroupsWithState` variant exists for
  * consumers that need the ledger row itself (seenAt auditing) or
  * custom admission logic. State is one timestamp per key — bounded
  * by watermark-driven EventTimeTimeout, shard-parallel by key.
  */
object StatefulLedger {

  final case class Keyed(dedupKey: String, eventId: String, receivedAt: Timestamp)
  final case class Admitted(
      dedupKey: String, eventId: String, receivedAt: Timestamp, seenAt: Timestamp)

  def admitFirst(
      events: DataFrame, ttlDays: Int = 14,
      watermarkDelay: String = "0 seconds"): Dataset[Admitted] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMs = ttlDays.toLong * 86400 * 1000

    def update(key: String, batch: Iterator[Keyed],
        state: GroupState[Timestamp]): Iterator[Admitted] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val rows = batch.toSeq.sortBy(r => (r.receivedAt.getTime, r.eventId))
      if (rows.isEmpty) return Iterator.empty
      if (state.exists) {
        // GroupState clears the timeout on EVERY invocation of this
        // function for the key — a duplicate arrival must re-arm it or
        // the ledger entry becomes immortal. Clamp to just past the
        // current watermark: setTimeoutTimestamp throws on timestamps
        // the watermark has already passed.
        state.setTimeoutTimestamp(
          math.max(state.get.getTime + ttlMs, state.getCurrentWatermarkMs() + 1))
        Iterator.empty // live ledger entry → all dups
      } else {
        val first = rows.head
        state.update(first.receivedAt)
        state.setTimeoutTimestamp(first.receivedAt.getTime + ttlMs)
        Iterator.single(Admitted(key, first.eventId, first.receivedAt, first.receivedAt))
      }
    }

    events
      .select(col("dedupKey"), col("eventId"), col("receivedAt"))
      .withWatermark("receivedAt", watermarkDelay)
      .as[Keyed]
      .groupByKey(_.dedupKey)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
