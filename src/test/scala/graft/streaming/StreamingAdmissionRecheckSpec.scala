package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The decontamination RECHECK closes the continuous loop's last
  * blind spot: [[StreamingAdmission.gateFlags]] joins arrivals
  * against the PUBLISHED quarantine id list, and that list can only
  * enumerate docs the nightly build saw — a genuinely new arrival
  * with benchmark overlap sails through the id join. The recheck
  * probes the arrival's own grams against the benchmark gram index
  * at window close. Gates: (1) on a replayed batch the recheck is
  * exactly `quarantine ∩ arrivals` (same predicate, same kernel);
  * (2) with a STALE quarantine table (arrival ids stripped — what a
  * pre-arrival snapshot would have published) the id join provably
  * misses contaminated arrivals and admission WIDENS, and adding the
  * recheck to compact() restores the decision the fresh list makes.
  * The stale leg runs at a full-rate card: at this corpus's published
  * rates the sampler happens to also drop every contaminated arrival,
  * which would leave the leak unobservable end-to-end. sf0.1 — the
  * decontam stage is empty at smaller SFs (the StreamingAdmissionSpec
  * rationale). */
class StreamingAdmissionRecheckSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("gram recheck == published quarantine restricted to arrivals; " +
      "a stale quarantine table admits contaminated arrivals unless " +
      "the recheck folds in") {
    val docs = graft.Tables(spark, dir, "documents")
    val arrPred = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    val arrivalDocs = docs.filter(arrPred)
      .select(col("doc_id"), col("source"), col("text"))

    val (rates, quarantine) = StreamingAdmission.publishedStatics(spark, dir)
    val bench = graft.queries.TextQueries.benchGramIndex(spark, dir)

    // (1) replayed-batch identity: the recheck recomputes, from text
    // alone, exactly the published list's arrival slice
    val recheck = StreamingAdmission.arrivalContamIds(arrivalDocs, bench)
      .collect().map(_.getLong(0)).toSet
    val wantContam = quarantine
      .filter(graft.queries.DedupQueries.isDeltaArrival(col("doc_id")))
      .collect().map(_.getLong(0)).toSet
    recheck shouldBe wantContam
    recheck.size should be > 0 // non-vacuous: the stage really drops

    // (2) the stale-table scenario. The published list predates the
    // arrivals: strip their ids. Run the gate at a FULL-RATE card
    // (sample_rate = 1 — sampling is a config knob, and at this
    // corpus's published rates the t13 sampler happens to also drop
    // every contaminated arrival, which would make the leak
    // unobservable end-to-end); the reference decision is the same
    // full-rate gate against the FRESH list.
    val fullRates = rates.withColumn("sample_rate", lit(1.0))
    val staleQuarantine = quarantine.filter(!arrPred)
    val flagsStale = StreamingAdmission.gateFlags(
      arrivalDocs, fullRates, staleQuarantine)
    val flagsFresh = StreamingAdmission.gateFlags(
      arrivalDocs, fullRates, quarantine)
    // batch dup evidence stands in for the landed hit table — the
    // stream/batch evidence identity is StreamingAdmissionSpec's
    // gate, not this spec's
    val hits = graft.queries.DedupQueries.deltaIdxPairsArtifact(spark, dir)
      .select(col("d1"), col("d2"))
      .union(graft.queries.DedupQueries.deltaBatchPairsArtifact(spark, dir)
        .select(col("d1"), col("d2")))

    def admitted(fin: org.apache.spark.sql.DataFrame): Set[Long] =
      fin.filter(col("admitted")).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    val admittedStale = admitted(StreamingAdmission.compact(flagsStale, hits))
    val admittedFresh = admitted(StreamingAdmission.compact(flagsFresh, hits))

    // the blind spot is REAL: without the recheck, contaminated
    // arrivals the stale list never saw get admitted
    val leaked = admittedStale -- admittedFresh
    leaked.size should be > 0
    leaked.foreach(id => wantContam should contain(id))

    // folding the recheck into compact() restores the fresh decision
    val admittedRecheck = admitted(StreamingAdmission.compact(
      flagsStale, hits,
      recheckContamIds =
        Some(StreamingAdmission.arrivalContamIds(arrivalDocs, bench))))
    admittedRecheck shouldBe admittedFresh
  }
}
