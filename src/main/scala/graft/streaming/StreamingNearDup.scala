package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextDedup

/** Streaming MinHash+LSH near-duplicate detection — the streaming
  * form of batch d3: documents arrive continuously and each one is
  * checked against the signatures already seen, so a pipeline can
  * reject near-dups AT INGEST instead of re-clustering the corpus.
  *
  * Dataflow: signature + band keys are the same stateless kernels as
  * batch (`graft_shingle_hash` → `graft_minhash` → band concat), so
  * batch and stream agree on what "near-dup" means. Each doc explodes
  * to one row per band; `flatMapGroupsWithState` keyed on (band, key)
  * holds the signatures seen in that bucket and emits a hit per
  * stored signature agreeing on ≥ `minSigMatches` of k positions.
  *
  * Scale/state story: state lives per band-bucket, sharded across
  * executors by bucket key — the same partitioning as the batch band
  * join. Two independent bounds apply, and BOTH matter:
  *  - bucket SIZE: each bucket stores at most `maxBucket` (sig, docId)
  *    pairs, FIFO-evicted — an overflowing bucket is by definition a
  *    boilerplate/dense bucket (the streaming analog of d2's frequency
  *    cap), so dropping its oldest members keeps recent history;
  *  - bucket COUNT: the number of distinct band keys grows with
  *    distinct content and is NOT bounded by `maxBucket`. On an
  *    unbounded stream, bound it with `stateTtlMs`: buckets idle
  *    longer than the TTL are dropped via a processing-time timeout
  *    (dedup recall then only reaches back `stateTtlMs` of wall
  *    clock — the operational knob for total state =
  *    active_buckets × maxBucket × k longs). With `stateTtlMs = 0`
  *    state never expires and memory is bounded only operationally
  *    (periodic reset / bounded corpus).
  *
  * Emission is per band, so a pair colliding in ≥2 bands emits ≥2
  * [[Hit]] rows (rows carry `band` so they stay unique); compose with
  * [[distinctHits]] for exactly-one-row-per-pair semantics across
  * both bands and redeliveries.
  */
object StreamingNearDup {

  final case class Banded(band: Int, key: String, docId: Long, sig: Seq[Long])
  final case class Hit(band: Int, d1: Long, d2: Long, sigMatches: Int)
  /** One row per near-dup PAIR, however many bands it collided in. */
  final case class PairHit(d1: Long, d2: Long, sigMatches: Int)

  /** docs(idCol: long, textCol: string) stream → Hit stream.
    * d1 = the arriving doc, d2 = the stored doc it matches.
    *
    * @param stateTtlMs drop band buckets idle this long (processing
    *        time); 0 = keep forever (see class doc). */
  /** docs/corpus → the banded (band, key, docId, sig) frame — one
    * shape for the live stream, and for a batch corpus being turned
    * into seed state. */
  private def bandedFrame(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int): Dataset[Banded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    docs
      .select(col(idCol).as("docId"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("xs", TextDedup.shingleHashes("w", 3))
      .withColumn("sig", TextDedup.minhashSig("xs", k))
      .select(col("docId"), col("sig"),
        explode(array((0 until bands).map(j =>
          struct(lit(j).as("band"),
            concat_ws("-", (0 until rows).map(r =>
              col("sig").getItem(j * rows + r)): _*).as("key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("docId"), col("sig"))
      .as[Banded]
  }

  def detect(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minSigMatches: Int = 12,
      maxBucket: Int = 64, stateTtlMs: Long = 0): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    bandedFrame(docs, idCol, textCol, k, bands)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        bucketUpdate(minSigMatches, maxBucket, stateTtlMs))
  }

  /** [[detect]] with the band-bucket state SEEDED from a batch corpus
    * — the streaming half of the incremental flow (batch half:
    * `TextDedup.lshCandidatesTwoSided`): the stream dedups against
    * the EXISTING corpus from its very first micro-batch instead of
    * only against what it has itself seen. The seed corpus runs
    * through the same kernel pipeline as the stream, so batch and
    * stream agree on every signature; per bucket the newest
    * `maxBucket` members are kept (highest doc id first — the FIFO
    * order live updates maintain).
    *
    * Scale: initial state is distributed exactly like live state
    * (sharded by bucket key across executors); seeding cost is one
    * pass over the corpus + one shuffle on the bucket key. */
  def detectSeeded(
      docs: DataFrame, idCol: String, textCol: String, corpus: DataFrame,
      k: Int = 16, bands: Int = 4, minSigMatches: Int = 12,
      maxBucket: Int = 64, stateTtlMs: Long = 0): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val initial = bandedFrame(corpus, idCol, textCol, k, bands)
      .groupByKey(b => (b.band, b.key))
      .mapGroups { (key, members) =>
        val seen = members.toList.sortBy(-_.docId).take(maxBucket)
          .map(b => (b.docId, b.sig))
        (key, seen)
      }
      .groupByKey(_._1).mapValues(_._2)
    bandedFrame(docs, idCol, textCol, k, bands)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append(), timeout, initial)(
        bucketUpdate(minSigMatches, maxBucket, stateTtlMs))
  }

  /** The per-bucket state transition behind [[detect]] — surfaced so
    * the timeout branch is unit-testable with `TestGroupState`
    * (deterministic; a live-clock streaming test of a ms-scale TTL is
    * a flake machine). */
  private[streaming] def bucketUpdate(
      minSigMatches: Int, maxBucket: Int, stateTtlMs: Long)(
      bucket: (Int, String), batch: Iterator[Banded],
      state: GroupState[List[(Long, Seq[Long])]]): Iterator[Hit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var seen = state.getOption.getOrElse(Nil)
    val out = Seq.newBuilder[Hit]
    // deterministic arrival order within the micro-batch
    batch.toSeq.sortBy(_.docId).foreach { doc =>
      seen.foreach { case (storedId, storedSig) =>
        if (storedId != doc.docId) {
          val m = storedSig.iterator.zip(doc.sig.iterator)
            .count { case (a, b) => a == b }
          if (m >= minSigMatches)
            out += Hit(bucket._1, doc.docId, storedId, m)
        }
      }
      seen = ((doc.docId, doc.sig) :: seen).take(maxBucket)
    }
    state.update(seen)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }

  /** Exactly-once pair emission: a second stateful stage keyed by
    * (d1, d2) that lets the FIRST hit for a pair through and swallows
    * every later one — collisions in other bands of the same batch,
    * and redeliveries in later batches, produce nothing. Within the
    * first batch the surviving row is the best evidence (max
    * sigMatches, then lowest band) so the output is deterministic.
    *
    * State is one boolean per emitted pair; like the bucket state it
    * grows with distinct content, and `stateTtlMs` bounds it the same
    * way. CONTRACT (pinned in StreamingNearDupSpec): with
    * `stateTtlMs > 0`, pair uniqueness is per-TTL-window — the TTL
    * slides on every sighting, and once a pair's marker expires a
    * later collision re-emits it. Global exactly-once requires
    * `stateTtlMs = 0` (unbounded state) or a downstream batch dedup.
    * Pick the TTL ≥ the upstream bucket TTL so a pair can only
    * re-emit once its evidence has itself been forgotten. */
  def distinctHits(hits: Dataset[Hit], stateTtlMs: Long = 0): Dataset[PairHit] = {
    val spark = hits.sparkSession
    import spark.implicits._
    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    hits.groupByKey(h => (h.d1, h.d2))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(pairDedup(stateTtlMs))
  }

  /** The per-pair state transition behind [[distinctHits]] — surfaced
    * for the same `TestGroupState` reason as [[bucketUpdate]]. */
  private[streaming] def pairDedup(stateTtlMs: Long)(
      key: (Long, Long), batch: Iterator[Hit],
      state: GroupState[Boolean]): Iterator[PairHit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val alreadyEmitted = state.exists
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    if (alreadyEmitted) Iterator.empty
    else {
      state.update(true)
      val best = batch.minBy(h => (-h.sigMatches, h.band))
      Iterator(PairHit(key._1, key._2, best.sigMatches))
    }
  }

  /** [[detect]] ∘ [[distinctHits]]: one row per near-dup pair. */
  def detectOnce(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minSigMatches: Int = 12,
      maxBucket: Int = 64, stateTtlMs: Long = 0): Dataset[PairHit] =
    distinctHits(
      detect(docs, idCol, textCol, k, bands, minSigMatches, maxBucket,
        stateTtlMs),
      stateTtlMs)
}
