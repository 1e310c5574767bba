package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The STREAMING twin of `b2_corpus_delta` — the corpus admission
  * loop run continuously instead of per nightly batch: arrival
  * documents flow through the same four gates the batch manifest
  * accounts for, and the admitted set is BIT-IDENTICAL to b2's on a
  * replayed arrival batch (StreamingAdmissionSpec's parity gate).
  *
  * Architecture — two in-stream stages plus a window-close
  * compaction, the Kappa shape a production ingest actually runs:
  *
  *  1. [[gateFlags]] (stateless, in-stream): every arrival is tagged
  *     `sampled` (t13's deterministic content-hash sampler against
  *     the PUBLISHED t12 rates — a broadcast #sources-row frame) and
  *     `contaminated` (stream-static left join against the durable
  *     quarantine table — the t20 drop set). Both gates are pure
  *     per-doc functions of published snapshot artifacts, so they
  *     stream with zero state.
  *  2. [[dupHits]] (stateful, in-stream): the expensive part — each
  *     arrival's MinHash/LSH band keys probe
  *     [[StreamingNearDup.detectSeeded]] state seeded from the
  *     ingested index, so a hit against an INDEX doc (d10's
  *     two-sided probe) and a hit against an EARLIER ARRIVAL (d3's
  *     batch-internal pairs) both emit from one pass. State is per
  *     band bucket, sharded across executors exactly like the batch
  *     band join, bounded by `maxBucket` × `stateTtlMs` (see
  *     StreamingNearDup's state story).
  *  3. [[compact]] (batch, at window close): survivor-min clustering
  *     is a BARRIER semantic — "keep the smallest pre-admissible
  *     member per connected component" is only decidable once the
  *     batch's pair graph is complete — so it runs as the end-of-
  *     window compaction over the landed flag/hit tables (connected
  *     components + one window), the same way b1/b2 close their
  *     nightly manifest. Everything per-doc and everything
  *     index-sized streams; only the cluster fold waits for the
  *     window.
  *
  * Scale: the stream side is arrival-sized per micro-batch (gates
  * are broadcast/static joins; the LSH probe touches only the
  * arriving docs' band buckets); the compaction is b2's audited
  * batch-internal CC shape, linear in the window's arrivals — never
  * arrivals × index.
  *
  * Reference basis: composes SURVEY §2.9's streaming surface with the
  * b-family build loop; the reference ingests per-webhook with the
  * same gate-then-dedup ordering
  * (src/workflows/ingest/orchestrator.ts), re-expressed as Structured
  * Streaming over corpus documents. */
object StreamingAdmission {

  /** The published per-snapshot gate artifacts: the t12 mixture-rate
    * card COLLECTED to a local frame (it is #sources rows; inlining
    * it spares every micro-batch the rate recomputation a live
    * static plan would re-run), and the durable quarantine drop set
    * (already a bucketed table scan — id-scale, cheap per batch).
    *
    * FEEDBACK edges (round 14): this card is the STREAM-START
    * snapshot; a continuous deployment wraps it in a
    * [[RatePublisher]], folds each closed window's admitted mass, and
    * republishes when the mixture-KL trigger fires — the next
    * micro-batch's [[gateFlags]] joins the new card
    * (RatePublisherSpec). The dedup index side of the loop is
    * b4_index_fold: the window's arrivals are appended to the durable
    * signature index + cluster labels, so the NEXT window's
    * [[dupHits]] seeds see them (StreamingAdmissionFoldSpec). */
  def publishedStatics(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val rates = graft.queries.BuildQueries.mixtureRates(s, dir)
    val local = s.createDataFrame(
      java.util.Arrays.asList(rates.collect(): _*), rates.schema)
    (local, graft.queries.TextQueries.decontamDropIds(s, dir))
  }

  /** Stage 1+2 flags: arrivals(doc_id, source, text) →
    * (doc_id, source, n_words, sample_rate, sampled, contaminated).
    * Stateless — safe in append mode with no watermark. */
  def gateFlags(arrivals: DataFrame, rates: DataFrame,
      quarantine: DataFrame): DataFrame =
    arrivals
      .withColumn("n_words",
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long"))
      .join(broadcast(rates), Seq("source"))
      .withColumn("sampled",
        graft.queries.BuildQueries.uniformU < col("sample_rate"))
      .join(broadcast(quarantine.withColumn("contaminated", lit(true))),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_words"),
        col("sample_rate"), col("sampled"), col("contaminated"))

  /** Stage 3 hit stream: one near-dup evidence row per (arrival,
    * stored) band agreement ≥ 12/16 — `d2` is an index doc (admission
    * dedup vs the ingested corpus) or an earlier arrival
    * (batch-internal pair); [[compact]] splits them by the arrival
    * predicate. `maxBucket`/`stateTtlMs` are the state bounds; the
    * EXACT-parity regime (spec) is unbounded (0 TTL, large bucket) —
    * production trades recall horizon for bounded state exactly like
    * StreamingNearDup documents. */
  def dupHits(arrivals: DataFrame, indexCorpus: DataFrame,
      maxBucket: Int = 1 << 20,
      stateTtlMs: Long = 0): Dataset[StreamingNearDup.Hit] =
    StreamingNearDup.detectSeeded(arrivals, "doc_id", "text", indexCorpus,
      k = 16, bands = 4, minSigMatches = 12, maxBucket = maxBucket,
      stateTtlMs = stateTtlMs)

  /** Window-close compaction: the landed flag/hit tables → b2's
    * decision frame (one row per arrival with `pre`, `cluster`,
    * `admitted`). `isArrival` classifies a hit's stored side:
    * arrival-arrival hits are the batch-internal pair graph,
    * arrival-index hits are the index-dup drop set. */
  def compact(flags: DataFrame, hits: DataFrame,
      isArrival: Column => Column =
        graft.queries.DedupQueries.isDeltaArrival,
      recheckContamIds: Option[DataFrame] = None): DataFrame = {
    // the gram-level decontamination RECHECK folds into the same
    // contaminated gate the id-list join feeds: an arrival the
    // published quarantine list never saw (it predates the arrival)
    // is still quarantined by its own gram evidence — admission can
    // only TIGHTEN
    val flagsR = recheckContamIds.map { ids =>
      flags.join(ids.select(col("doc_id")).distinct()
          .withColumn("recheck_contam", lit(true)), Seq("doc_id"), "left")
        .withColumn("contaminated",
          coalesce(col("contaminated"), col("recheck_contam")))
        .drop("recheck_contam")
    }.getOrElse(flags)
    val idxDup = hits.filter(!isArrival(col("d2")))
      .select(col("d1").as("doc_id")).distinct()
      .withColumn("dup_index", lit(true))
    val pairs = hits.filter(isArrival(col("d2")))
      .select(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"))
      .distinct()
    val clusters = graft.operators.ConnectedComponents
      .run(pairs, "d1", "d2", flagsR.select(col("doc_id")), "doc_id")
      .select(col("id").as("doc_id"), col("cluster"))
    val pre = flagsR
      .join(idxDup, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"))
      .withColumn("pre", col("sampled") && col("contaminated").isNull &&
        col("dup_index").isNull)
    val keeper = min(when(col("pre"), col("doc_id")))
      .over(Window.partitionBy(col("cluster")))
    pre.withColumn("admitted", col("pre") && col("doc_id") === keeper)
  }

  /** The decontamination RECHECK for new arrivals — the gap the
    * published quarantine table cannot cover: that table ENUMERATES
    * docs the nightly build already saw, so a truly new arrival with
    * benchmark overlap sails through [[gateFlags]]' id join. This
    * probe computes the arrival's own 8-gram evidence against the
    * benchmark gram index (the exact t20 predicate — distinct-gram
    * overlap ≥ 5% of the doc's grams, UNROUNDED, same ShingleHash
    * kernel), so on a replayed batch the result is exactly
    * `quarantine ∩ arrivals` (StreamingAdmissionRecheckSpec), and on
    * genuinely new docs it is the decision the nightly build WILL
    * make. Runs at window close beside [[compact]] — per-doc gram
    * aggregation is a barrier over the landed arrivals, the same
    * contract as survivor-min; the join side is the broadcast-scale
    * benchmark index ([[graft.queries.TextQueries.benchGramIndex]]).
    */
  def arrivalContamIds(arrivalDocs: DataFrame,
      benchGrams: DataFrame): DataFrame =
    arrivalDocs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(org.apache.spark.sql.functions.size(col("w")) >= 8)
      .select(col("doc_id"),
        graft.operators.TextDedup.shingleHashes("w", 8).as("xs"))
      .select(col("doc_id"), expr("size(xs)").cast("long").as("n_grams"),
        explode(col("xs")).as("gram"))
      // benchGrams (benchGramIndex) is already distinct; and even
      // under a duplicated gram frame the countDistinct below keeps
      // the 5% ratio exact — no second distinct on the hot path
      .join(broadcast(benchGrams.select(col("gram"))), Seq("gram"))
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(countDistinct(col("gram")).as("nc"))
      .filter(col("nc").cast("double") / col("n_grams") >= 0.05)
      .select(col("doc_id"))
}
