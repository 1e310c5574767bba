package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One input row for [[MmrGreedyAgg]]: candidate `n1` (with its
  * query-cosine `cos1`, already snapped to 1e-6 upstream) and one
  * candidate-pair edge `n1 → n2` with pair-cosine `pcos` (also
  * pre-snapped). `n2`/`pcos` are None on the per-candidate base rows
  * that guarantee single-candidate groups still reach the aggregator. */
final case class MmrIn(n1: Long, cos1: Double, n2: Option[Long],
    pcos: Option[Double])

/** One greedy pick, in pick order: candidate id + its MMR score in
  * the round it was selected. */
final case class MmrPick(nid: Long, mmr: Double)

/** Typed greedy MMR (maximal-marginal-relevance, Carbonell &
  * Goldstein '98) selection per query group: from a bounded candidate
  * set (the upstream retrieval's top-k, ≤ ~a dozen rows) with
  * pre-computed pairwise cosines, greedily pick `k` maximizing
  * `λ·sim(q,d) − (1−λ)·max_{s∈picked} sim(d,s)`.
  *
  * Scale story: the greedy loop is per-QUERY work over candidate²
  * pair rows — this aggregator runs it inside ONE hash aggregation
  * keyed by qid (map-side partials merge the tiny row buffers), so a
  * million-query re-rank batch is one shuffle, not 4 driver-
  * coordinated join rounds with lineage cuts per round (the shape
  * this replaced: each round cost a global barrier + checkpoint; the
  * buffers here are candidate-set-sized and never touch the driver).
  *
  * Determinism (the cross-engine contract with the unrolled DuckDB
  * CTE rounds): every input cosine is pre-snapped to 1e-6; each
  * round's score re-snaps to 1e-6 via the s7 floor(x·1e6 + ½)/1e6
  * convention (same IEEE ops on identical doubles in both engines;
  * BigDecimal HALF_UP and DuckDB ROUND disagree on exact binary
  * halfway scores); the argmax orders by (mmr DESC, nid ASC), a total
  * order, so buffer order never matters; `max` over the picked-set
  * sims is order-free. Candidates with no pair edge to any picked
  * member are skipped in penalized rounds — the inner-join semantics
  * of the frame formulation this mirrors (unreachable when the pair
  * frame is complete, as a top-k candidate set's is).
  */
final class MmrGreedyAgg(k: Int, lambda: Double)
    extends Aggregator[MmrIn, List[MmrIn], Seq[MmrPick]] {

  override def zero: List[MmrIn] = Nil
  override def reduce(b: List[MmrIn], a: MmrIn): List[MmrIn] = a :: b
  override def merge(a: List[MmrIn], b: List[MmrIn]): List[MmrIn] = a ::: b

  override def finish(rows: List[MmrIn]): Seq[MmrPick] = {
    // r18: floor(x·1e6 + ½)/1e6 (the s7 convention), NOT BigDecimal
    // HALF_UP — at sf0.1 an MMR score landed on an exact binary
    // halfway (0.0724145) where BigDecimal-of-the-exact-double and
    // DuckDB's ROUND disagree; the floor form is the same IEEE ops on
    // identical doubles in both engines (mirrored in mmrSqlCtes).
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // candidate → query-cos (duplicates collapse; cos1 repeats per edge)
    val cos: Map[Long, Double] =
      rows.iterator.map(r => r.n1 -> r.cos1).toMap
    val pcos: Map[(Long, Long), Double] = rows.iterator.collect {
      case MmrIn(a, _, Some(b), Some(p)) => (a, b) -> p
    }.toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    val pickedIds = scala.collection.mutable.Set.empty[Long]
    var continue = true
    while (continue && picked.size < k && pickedIds.size < cos.size) {
      var bestId = -1L
      var bestMmr = 0.0
      cos.foreach { case (nid, c) =>
        if (!pickedIds.contains(nid)) {
          val mmr =
            if (pickedIds.isEmpty) r6(lambda * c)
            else {
              var maxsim = Double.NegativeInfinity
              pickedIds.foreach { p =>
                pcos.get((nid, p)).foreach(v => if (v > maxsim) maxsim = v)
              }
              if (maxsim == Double.NegativeInfinity) Double.NaN
              else r6(lambda * c - (1 - lambda) * maxsim)
            }
          // argmax by (mmr DESC, nid ASC); NaN = no pair edge → skip
          if (!mmr.isNaN &&
              (bestId < 0 || mmr > bestMmr ||
                (mmr == bestMmr && nid < bestId))) {
            bestId = nid; bestMmr = mmr
          }
        }
      }
      if (bestId < 0) continue = false
      else { picked += MmrPick(bestId, bestMmr); pickedIds += bestId }
    }
    picked.toSeq
  }

  override def bufferEncoder: Encoder[List[MmrIn]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[MmrPick]] = ExpressionEncoder()
}
