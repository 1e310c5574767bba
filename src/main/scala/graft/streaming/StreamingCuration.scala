package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.etl.Curation
import graft.operators.TextDedup

/** The ingest-time form of the batch curation pipeline
  * ([[graft.etl.Curation.run]]): documents stream in and each one is
  * normalized, language-gated, quality-gated, exact-deduped and
  * near-dup-rejected against everything already admitted — so a
  * pretraining corpus stays curated AS IT GROWS instead of being
  * re-curated from scratch per snapshot (c1's streaming analog).
  *
  * Stage parity with batch: normalization and the gates are the SAME
  * Column expressions ([[Curation.normalize]]/[[Curation.langGateOk]]);
  * signatures are the same `graft_shingle_hash` → `graft_minhash`
  * kernels; and the first-arrival-wins streaming decisions coincide
  * with batch's min-id-wins whenever arrival order follows doc id
  * (rejected docs still leave their signature in bucket state, which
  * is exactly the transitive-closure behavior of batch's
  * connected-components step: a near-dup of a REJECTED doc is also
  * rejected).
  *
  * Dataflow: three stateful stages in one append-mode query —
  * `dropDuplicates` on the normalized fingerprint (exact dedup, D1
  * ledger semantics), a band-bucket `flatMapGroupsWithState` emitting
  * a per-(doc, band) verdict, and a per-doc stage that admits a doc
  * only if NO band found a stored near-match. Per-stage attrition is
  * published through `observe` metrics (`curation_input`,
  * `curation_lang_gate`, `curation_quality_gate`,
  * `curation_exact_dedup`, `curation_near_dedup`) so a monitor reads
  * the same ledger the batch report prints.
  *
  * State story: band-bucket state is [[StreamingNearDup]]'s (FIFO cap
  * per bucket), `dropDuplicates` state is one fingerprint per
  * distinct admitted text, and the per-doc stage keeps one boolean
  * per admitted doc id. `stateTtlMs > 0` arms a processing-time
  * timeout on BOTH flatMapGroupsWithState stages (idle band buckets
  * and admit markers are dropped), bounding their state on an
  * unbounded ingest session with the same per-TTL-window contract as
  * [[StreamingNearDup.distinctHits]]: after expiry a re-delivered doc
  * id can re-admit, and dedup recall reaches back `stateTtlMs` of
  * wall clock. The exact-dedup ledger is bounded the event-time way:
  * pass `eventTimeCol` and the stage becomes `withWatermark` +
  * `dropDuplicatesWithinWatermark` — a fingerprint's state is evicted
  * once the watermark passes its event time + `watermarkDelay`, so
  * ledger size tracks the delay window instead of the corpus. With no
  * event-time column the stage stays the unbounded global
  * `dropDuplicates` (exact-dedup recall never expires — the right
  * default for a bounded backfill, documented for unbounded ingest).
  *
  * Picking `watermarkDelay`: don't hand-pick it — calibrate it. The
  * DOCUMENTED DEFAULT composition derives the delay from the batch
  * lateness audit via [[WatermarkCalibration.calibrate]] (e33's exact
  * per-transport-partition p99 disorder + margin); the literal
  * "10 minutes" here is only the uncalibrated fallback for corpora
  * with no audit yet. WatermarkCalibrationSpec proves the calibrated
  * delay keeps a disorder-injected replay in full while a tight
  * guess drops data, at ~1/5000 of the 14-day-style state cost.
  */
object StreamingCuration {

  final case class BandedDoc(band: Int, key: String, docId: Long,
      text: String, norm: String, sig: Seq[Long])
  final case class Verdict(docId: Long, text: String, norm: String, hit: Boolean)
  final case class CuratedDoc(id: Long, text: String, norm: String)

  /** The normalize → shingle → sig → band-explode block, shared by
    * the live stream and the seed-corpus path so both sides agree on
    * every signature. Input must carry (id, text, norm, w). */
  private def bandedDocs(normed: DataFrame, minhashK: Int, bands: Int): Dataset[BandedDoc] = {
    val spark = normed.sparkSession
    import spark.implicits._
    val rows = minhashK / bands
    normed
      .withColumn("xs", TextDedup.shingleHashes("w", 3))
      .filter(size(col("xs")) > 0)
      .withColumn("sig", TextDedup.minhashSig("xs", minhashK))
      .select(col("id"), col("text"), col("norm"), col("sig"),
        explode(array((0 until bands).map(j =>
          struct(lit(j).as("band"),
            concat_ws("-", (0 until rows).map(r =>
              col("sig").getItem(j * rows + r)): _*).as("key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("id").as("docId"), col("text"), col("norm"), col("sig"))
      .as[BandedDoc]
  }

  /** docs(idCol: long, textCol: string) stream → admitted docs
    * (id, text, norm), with per-stage observe counters.
    *
    * `seedCorpus` (id, text — typically the previously ADMITTED
    * corpus) pre-populates the near-dup band buckets through the
    * SAME normalize/signature pipeline, so ingest rejects near-dups
    * of the existing corpus from the first micro-batch — the
    * curation analog of [[StreamingNearDup.detectSeeded]]. Note the
    * exact-dedup `dropDuplicates` ledger cannot be seeded this way
    * (no initial-state API); an exact dup of a seed doc is still
    * caught by the near-dup stage (identical text ⇒ identical
    * signatures ⇒ bucket hit). */
  def ingest(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minStopRatio: Double = 0.05, minWords: Int = 10,
      minhashK: Int = 16, bands: Int = 4, minSigMatches: Int = 12,
      maxBucket: Int = 64, stateTtlMs: Long = 0,
      seedCorpus: Option[DataFrame] = None,
      eventTimeCol: Option[String] = None,
      watermarkDelay: String = "10 minutes"): Dataset[CuratedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._

    val keep = Seq(col(idCol).as("id"), col(textCol).as("text")) ++
      eventTimeCol.map(col)
    val base = docs.select(keep: _*)
      .observe("curation_input", count(lit(1)).as("docs"))
    val normed = base.withColumn("norm", Curation.normalize(col("text")))
      .withColumn("w", split(col("norm"), " "))
    val lang = normed.filter(Curation.langGateOk(minStopRatio))
      .observe("curation_lang_gate", count(lit(1)).as("docs"))
    val quality = lang.filter(size(col("w")) >= minWords)
      .observe("curation_quality_gate", count(lit(1)).as("docs"))
    val exact = exactStage(quality, eventTimeCol, watermarkDelay)
      .observe("curation_exact_dedup", count(lit(1)).as("docs"))

    val banded = bandedDocs(exact, minhashK, bands)

    val timeout = if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val grouped = banded.groupByKey(b => (b.band, b.key))
    val verdicts = seedCorpus match {
      case Some(c) =>
        val seedNormed = c.select(col(idCol).as("id"), col(textCol).as("text"))
          .withColumn("norm", Curation.normalize(col("text")))
          .withColumn("w", split(col("norm"), " "))
        val initial = bandedDocs(seedNormed, minhashK, bands)
          .groupByKey(b => (b.band, b.key))
          .mapGroups { (key, members) =>
            (key, members.toList.sortBy(-_.docId).take(maxBucket)
              .map(d => (d.docId, d.sig)))
          }
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState(OutputMode.Append(), timeout, initial)(
          bandGate(minSigMatches, maxBucket, stateTtlMs))
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append(), timeout)(
          bandGate(minSigMatches, maxBucket, stateTtlMs))
    }

    verdicts.groupByKey(_.docId)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        admit(stateTtlMs))
      .observe("curation_near_dedup", count(lit(1)).as("docs"))
  }

  /** Exact-dedup ledger stage: first arrival of a normalized
    * fingerprint wins. With `eventTimeCol` set, the ledger is
    * watermark-bounded: `dropDuplicatesWithinWatermark` keeps a
    * fingerprint's state only until the watermark passes its event
    * time + `watermarkDelay` — after that a re-arrival is admitted
    * again (per-window exact dedup, the event-time analog of the
    * near-dup stages' `stateTtlMs` contract). Without it the state is
    * one fingerprint per distinct admitted text, forever (global
    * dedup, unbounded on an endless stream). Input must carry `norm`;
    * emits the input columns plus `nfp`. */
  private[streaming] def exactStage(quality: DataFrame,
      eventTimeCol: Option[String], watermarkDelay: String): DataFrame = {
    val fp = quality.withColumn("nfp", md5(col("norm")))
    eventTimeCol match {
      case Some(et) => fp.withWatermark(et, watermarkDelay)
        .dropDuplicatesWithinWatermark("nfp")
      case None => fp.dropDuplicates("nfp")
    }
  }

  /** Band-bucket stage: same state shape as
    * [[StreamingNearDup.bucketUpdate]], but emits one verdict per
    * (doc, band) ALWAYS — the downstream per-doc stage needs the
    * no-hit rows too, or clean docs would simply vanish. Docs process
    * in id order within a batch, so the lowest id of a same-batch
    * near-dup group is stored first and survives — batch's
    * min-id-wins rule. */
  private[streaming] def bandGate(
      minSigMatches: Int, maxBucket: Int, stateTtlMs: Long = 0)(
      bucket: (Int, String), batch: Iterator[BandedDoc],
      state: GroupState[List[(Long, Seq[Long])]]): Iterator[Verdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var seen = state.getOption.getOrElse(Nil)
    val out = Seq.newBuilder[Verdict]
    batch.toSeq.sortBy(_.docId).foreach { doc =>
      val hit = seen.exists { case (storedId, storedSig) =>
        storedId != doc.docId &&
          storedSig.iterator.zip(doc.sig.iterator)
            .count { case (a, b) => a == b } >= minSigMatches
      }
      out += Verdict(doc.docId, doc.text, doc.norm, hit)
      // rejected docs are stored too — transitive rejection (see class doc)
      seen = ((doc.docId, doc.sig) :: seen).take(maxBucket)
    }
    state.update(seen)
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    out.result().iterator
  }

  /** Per-doc stage: all of a doc's band verdicts are produced in the
    * same micro-batch (one exploded input row), so the admit decision
    * is complete here; the boolean state only guards against a doc id
    * being re-admitted by a later redelivery that dodged the exact
    * ledger (per-TTL-window when `stateTtlMs > 0` — see class doc). */
  private[streaming] def admit(stateTtlMs: Long = 0)(
      docId: Long, batch: Iterator[Verdict],
      state: GroupState[Boolean]): Iterator[CuratedDoc] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val vs = batch.toSeq
    if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
    if (vs.isEmpty || vs.exists(_.hit) || state.exists) Iterator.empty
    else {
      state.update(true)
      Iterator(CuratedDoc(docId, vs.head.text, vs.head.norm))
    }
  }
}
