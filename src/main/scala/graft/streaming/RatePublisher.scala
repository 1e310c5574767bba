package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Continuously-REPUBLISHABLE gate statics for the admission loop
  * (round 14 — the statics half of the feedback edge). [[StreamingAdmission.publishedStatics]]
  * collects the t12 mixture-rate card once at stream start; as
  * admitted token mass accumulates, the true per-source mixture
  * drifts and a frozen card samples at yesterday's rates. This handle
  * owns the accumulated mass, watches the drift with the mixture-KL
  * monitor (t28's statistic at source granularity: t28 watches the
  * word distribution per source, the rate card is a function of the
  * SOURCE-share distribution — same divergence, one level up), and
  * republishes the card when the drift crosses the trigger.
  *
  * Lifecycle per window close (or per `foreachBatch`):
  *
  *   1. [[fold]] the window's admitted per-source token mass;
  *   2. the handle computes KL(accumulated shares ‖ published shares)
  *      in nats ([[driftNats]]);
  *   3. if the drift exceeds the threshold the card is recomputed —
  *      through [[graft.queries.BuildQueries.mixtureRatesFromMass]],
  *      the BIT-IDENTICAL t12 arithmetic — over the accumulated mass
  *      and swapped in; in-flight consumers keep the old broadcast
  *      frame (a #sources-row local relation), the next micro-batch's
  *      [[StreamingAdmission.gateFlags]] plan picks up the new one.
  *
  * Scale: everything here is #sources-sized driver state — the card
  * is a local relation broadcast into each micro-batch, the fold is
  * one map merge, the KL is a #sources-term sum. The expensive inputs
  * (per-window admitted mass) arrive pre-aggregated from the window's
  * own compact() output. */
final class RatePublisher private (s: SparkSession,
    initialMass: Map[String, Long], val quarantine: DataFrame) {

  @volatile private var accMass: Map[String, Long] = initialMass
  @volatile private var pubMass: Map[String, Long] = initialMass
  @volatile private var card: DataFrame = localCard(initialMass)
  @volatile private var nPublished: Int = 1

  /** The currently-published rate card — a local #sources-row frame,
    * safe to broadcast-join per micro-batch. */
  def rates: DataFrame = card

  /** Published-card generation (1 = the stream-start card). */
  def generation: Int = nPublished

  /** KL(accumulated source shares ‖ published source shares) in nats
    * — the republish trigger statistic. A source unseen by the
    * published card (share 0) is infinite drift: republish. */
  def driftNats: Double = RatePublisher.klShares(accMass, pubMass)

  /** Fold one window's ADMITTED per-source token mass into the
    * accumulated state, then republish the card iff the mixture
    * drift exceeds `klThresholdNats`. Returns true when a new card
    * was published. */
  def fold(admittedMass: Map[String, Long],
      klThresholdNats: Double): Boolean = synchronized {
    accMass = (accMass.keySet ++ admittedMass.keySet).map { k =>
      k -> (accMass.getOrElse(k, 0L) + admittedMass.getOrElse(k, 0L))
    }.toMap
    if (driftNats > klThresholdNats) {
      card = localCard(accMass)
      pubMass = accMass
      nPublished += 1
      true
    } else false
  }

  /** Recompute the t12 card over a mass map and COLLECT it local
    * (the publishedStatics convention: the card is #sources rows;
    * inlining spares every micro-batch the recomputation). */
  private def localCard(mass: Map[String, Long]): DataFrame = {
    val src = s.createDataFrame(
      java.util.Arrays.asList(
        mass.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType))))
    val rates = graft.queries.BuildQueries.mixtureRatesFromMass(src)
    s.createDataFrame(
      java.util.Arrays.asList(rates.collect(): _*), rates.schema)
  }
}

object RatePublisher {

  /** Publisher seeded from the ingested corpus `docs(source, text)` —
    * the mass the build published its card over. The quarantine scan
    * is the durable t20 drop set (id-scale, re-scanned per batch). */
  def over(s: SparkSession, dir: String, docs: DataFrame): RatePublisher = {
    val mass = docs
      .select(col("source"),
        org.apache.spark.sql.functions.size(split(col("text"), " "))
          .cast("long").as("n_words"))
      .groupBy(col("source")).agg(sum(col("n_words")).as("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new RatePublisher(s, mass,
      graft.queries.TextQueries.decontamDropIds(s, dir))
  }

  /** KL(p ‖ q) in nats over source-share distributions derived from
    * token-mass maps; q-missing support ⇒ infinite drift. */
  private[streaming] def klShares(pMass: Map[String, Long],
      qMass: Map[String, Long]): Double = {
    val pTot = pMass.values.sum.toDouble
    val qTot = qMass.values.sum.toDouble
    pMass.foldLeft(0.0) { case (acc, (k, pv)) =>
      if (pv == 0L) acc
      else qMass.get(k).filter(_ > 0L) match {
        case None => Double.PositiveInfinity
        case Some(qv) =>
          val p = pv / pTot
          acc + p * math.log(p / (qv / qTot))
      }
    }
  }
}
