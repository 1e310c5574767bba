package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time boilerplate detection — the streaming twin of the
  * batch t24 profile (`TextQueries.t24_boilerplate`): as documents
  * stream in, a chunk key (md5 of a 10-word window) that reaches
  * `threshold` DISTINCT documents within one source is emitted ONCE
  * as newly-boilerplate — the signal an ingest pipeline uses to
  * start stripping a header/footer/nav block the moment it starts
  * recurring, instead of waiting for the next batch profile.
  *
  * State story (the part that makes this 100 TB-safe): per
  * (source, chunk-key) the state holds AT MOST `threshold − 1` doc
  * ids — once the key crosses, the id set is DROPPED and replaced by
  * a boolean flag, so hot boilerplate keys (the ones that recur
  * forever) carry O(1) state and only cold near-misses carry the
  * bounded id set. `stateTtlMs > 0` arms a processing-time timeout
  * that evicts quiet keys (boilerplate profiles are per-snapshot;
  * the StreamingNearDup TTL contract).
  *
  * Determinism contract (stated precisely — the WHICH and the WHEN
  * are invariant, the reported count is not): the set of flagged
  * keys and the at-most-once emission per key are independent of how
  * the input is split into batches (a set union is order- and
  * batching-insensitive). The emitted `df` is NOT a pure function of
  * the data: it is the distinct-doc count as of the END of the batch
  * in which the key crossed, so finer batching reports values closer
  * to `threshold` while one mega-batch reports that batch's full
  * count. Consumers must treat `df` as a lower-bounded observation
  * (`threshold ≤ df ≤ true df`), never as the total document
  * frequency — the batch t24 profile is the exact-count source.
  * Emission is append-mode, so downstream `foreachBatch` strippers
  * can union the emitted keys into their block-list idempotently.
  */
object StreamingBoilerplate {

  final case class ChunkObs(source: String, ck: String, docId: Long)
  final case class BoilerKey(source: String, ck: String, df: Long)

  /** `flagged` ⇒ `seen` is empty (the O(1) post-crossing state). */
  final case class KeyState(flagged: Boolean, seen: Seq[Long])

  /** The batch t24 chunking, reused verbatim: 10-word windows (last
    * one ragged) keyed by md5 of the exact chunk text. Works on any
    * frame with (doc_id, source, text) — batch or streaming. */
  def chunks(docs: DataFrame): Dataset[ChunkObs] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, CAST(ceil(size(w)/10.0) AS INT) - 1), " +
          "i -> array_join(slice(w, i*10+1, 10), ' '))")).as("chunk"))
      .select(col("source"), md5(col("chunk")).as("ck"),
        col("doc_id").as("docId"))
      .as[ChunkObs]
  }

  def detect(obs: Dataset[ChunkObs], threshold: Int,
      stateTtlMs: Long = 0): Dataset[BoilerKey] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    obs.groupByKey(o => (o.source, o.ck))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        update(threshold, stateTtlMs))
  }

  /** Per-key transition, surfaced for TestGroupState unit specs. */
  private[streaming] def update(threshold: Int, stateTtlMs: Long = 0)(
      key: (String, String), batch: Iterator[ChunkObs],
      state: GroupState[KeyState]): Iterator[BoilerKey] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(KeyState(flagged = false, Seq.empty))
    val out: Iterator[BoilerKey] =
      if (st.flagged) { state.update(st); Iterator.empty }
      else {
        val seen = st.seen.toSet ++ batch.map(_.docId)
        if (seen.size >= threshold) {
          state.update(KeyState(flagged = true, Seq.empty)) // drop the set
          Iterator.single(BoilerKey(key._1, key._2, seen.size.toLong))
        } else {
          state.update(KeyState(flagged = false, seen.toSeq.sorted))
          Iterator.empty
        }
      }
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out
  }
}
