package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the batch systematic PPS sampler
  * (t27_systematic_sample in [[graft.queries.TextQueries]]): docs
  * stream in per source and one doc is emitted every `stepTokens`
  * tokens of cumulative weight — the ONLINE version of the sampler.
  * The batch form spends a KNOWN corpus total across N picks
  * (step = tot/N); a stream has no total, so the knob inverts to a
  * fixed token budget RATE ("one doc per S tokens"), which is what an
  * always-on ingest pipeline actually provisions: the sample grows
  * linearly with the stream at exactly 1/S docs-per-token, zero
  * variance, no RNG, reproducible from the doc feed alone.
  *
  * Pick rule (identical arithmetic to t27 with tot/N replaced by S):
  * a doc is picked iff its token span crosses a step boundary —
  * `cum div S > (cum - nTokens) div S`, pure integer division. A doc
  * spanning MULTIPLE boundaries still emits once (t27 semantics); the
  * batch twin with the same fixed step is bit-identical
  * (StreamingSamplerSpec parity gate).
  *
  * Input contract: within a micro-batch docs are processed in docId
  * order, and a doc whose id is ≤ the newest id already seen for its
  * source is IGNORED — at-least-once redelivery neither double-counts
  * the budget nor re-picks (the StreamingAnomaly late-delivery
  * contract). An arrival-order variant is the same transition minus
  * the sort; the budget properties hold either way, only the picked
  * SET changes (and with it batch parity — which is why the declared
  * contract is id order).
  *
  * State story: 3 longs per source (newest id, cumulative tokens,
  * picks) — O(1), unbounded-growth-free; `stateTtlMs > 0` arms a
  * processing-time timeout that releases quiet sources — after
  * expiry the budget walk RESTARTS at zero for that source (document
  * the trade: TTL bounds state for unbounded source cardinality at
  * the price of a fresh phase; leave it off when sources are few and
  * long-lived). */
object StreamingSampler {

  final case class Doc(source: String, docId: Long, nTokens: Long)
  final case class Pick(source: String, docId: Long, nTokens: Long,
      pickNo: Long)

  /** Per-source state: (newest docId seen, cumulative tokens, picks). */
  private type S = (Long, Long, Long)

  def sample(docs: Dataset[Doc], stepTokens: Long,
      stateTtlMs: Long = 0): Dataset[Pick] = {
    require(stepTokens > 0, "stepTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        pick(stepTokens, stateTtlMs))
  }

  /** The per-source state transition — surfaced for TestGroupState
    * unit specs (the streaming-suite convention). */
  private[streaming] def pick(stepTokens: Long, stateTtlMs: Long = 0)(
      source: String, batch: Iterator[Doc],
      state: GroupState[S]): Iterator[Pick] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var (maxId, cum, picks) = state.getOption.getOrElse((-1L, 0L, 0L))
    val out = Seq.newBuilder[Pick]
    batch.toSeq.sortBy(_.docId).foreach { d =>
      if (d.docId > maxId) {
        maxId = d.docId
        val before = cum / stepTokens
        cum += d.nTokens
        if (cum / stepTokens > before) {
          picks += 1
          out += Pick(source, d.docId, d.nTokens, picks)
        }
      } // id ≤ newest seen: late/duplicate delivery, ignored
    }
    state.update((maxId, cum, picks))
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }
}
