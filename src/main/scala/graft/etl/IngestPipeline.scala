package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full ingest dataflow in the reference's order (SURVEY §3.1):
  * route→adapt (F4, P*, F1-F2) → within-batch dedup (D1) → roster
  * gate (F3) → ledger dedup (D2) → dim hints from admitted events
  * only (A1) → facts + ledger delta.
  *
  * Operator ordering is deliberately preserved from the reference's
  * hand-tuned dataflow (SURVEY §4): dedup before the gate and ledger
  * keeps the expensive stages minimal; hints are pruned to NEW events
  * (semi-join reduction).
  */
object IngestPipeline {

  final case class Output(
      facts: DataFrame, ledgerDelta: DataFrame,
      agentHints: DataFrame, dateHints: DataFrame, metricHints: DataFrame)

  def run(
      envelopes: DataFrame, ledger: DataFrame,
      roster: Option[DataFrame], nowEpochSec: Long,
      ttlDays: Int = 14): Output = {
    val adapted = Adapters.route(envelopes)
    val deduped = Dedup.withinBatchFirstWins(adapted, "eventId",
      col("receivedAt"), col("dedupKey"))
    val allowed = RosterGate(deduped, roster)
    val (admitted, delta) = Dedup.ledgerDedup(allowed, ledger, nowEpochSec, ttlDays)
    // A1 — distinct key sets for dim upserts, from admitted rows only.
    Output(
      facts = admitted,
      ledgerDelta = delta,
      agentHints = admitted.select(col("agentId")).distinct(),
      dateHints = admitted.select(col("factDateKey")).distinct(),
      metricHints = admitted.select(col("metricId")).distinct())
  }
}
