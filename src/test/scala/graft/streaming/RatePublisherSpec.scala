package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gate statics must be REPUBLISHABLE mid-stream (round 14): the
  * t12 rate card is recomputed over corpus ∪ admitted mass when the
  * mixture-KL trigger fires, and the in-stream sampler picks the new
  * card up on the next micro-batch — no query restart. */
class RatePublisherSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  private def docsOf(pred: org.apache.spark.sql.Column): DataFrame =
    graft.Tables(spark, dir, "documents")
      .filter(pred).select(col("doc_id"), col("source"), col("text"))

  private def massOf(d: DataFrame): Map[String, Long] = d
    .groupBy(col("source"))
    .agg(sum(expr("cast(size(split(text, ' ')) as long)")).as("m"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("mid-stream republish: the sampler joins the NEW card on the " +
      "next micro-batch after the KL trigger fires") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val arrP = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    val index0 = docsOf(!arrP && col("doc_id") % 10 =!= 7)
    val w1 = docsOf(col("doc_id") % 14 === 3 && col("doc_id") % 10 =!= 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val w2 = docsOf(col("doc_id") % 7 === 3 && col("doc_id") % 14 =!= 3 &&
      col("doc_id") % 10 =!= 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val pub = RatePublisher.over(spark, dir, index0)
    val card0 = pub.rates.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

    // one CONTINUOUS query; each micro-batch gates against whatever
    // card the publisher currently serves
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, String, Double)]() // (batchId, doc_id, source, rate)
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "source", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        StreamingAdmission.gateFlags(b, pub.rates, pub.quarantine)
          .select(col("doc_id"), col("source"), col("sample_rate"))
          .collect().foreach(r => collected.add(
            (batchId, r.getLong(0), r.getString(1), r.getDouble(2))))
        ()
      }.start()
    try {
      in.addData(w1.toSeq)
      q.processAllAvailable()

      // window 1 closes: fold its mass; drift is nonzero, the card
      // republishes (threshold 0 = always-on trigger)
      val mass1 = massOf(docsOf(col("doc_id") % 14 === 3 &&
        col("doc_id") % 10 =!= 7))
      pub.driftNats shouldBe 0.0 // nothing folded yet
      pub.fold(mass1, klThresholdNats = 0.0) shouldBe true
      pub.generation shouldBe 2
      val card1 = pub.rates.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      card1.keySet shouldBe card0.keySet
      card1.exists { case (k, v) => v != card0(k) } shouldBe true

      // the republished card IS the t12 arithmetic over the merged
      // mass (bit-identical recompute through the same plan)
      val mass0 = massOf(index0)
      val merged = mass0 ++ mass1.map { case (k, v) =>
        k -> (mass0.getOrElse(k, 0L) + v) }
      val want = graft.queries.BuildQueries.mixtureRatesFromMass(
        spark.createDataFrame(
          java.util.Arrays.asList(merged.toSeq.sortBy(_._1).map {
            case (k, v) => org.apache.spark.sql.Row(k, v) }: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n_tokens",
              org.apache.spark.sql.types.LongType)))))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      card1 shouldBe want

      // window 2 flows through the SAME query — and must be sampled
      // at the NEW rates
      in.addData(w2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val card1Final = pub.rates.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = collected.iterator().asScala.toSeq
    val batch1 = rows.filter(r => w1.exists(_._1 == r._2))
    val batch2 = rows.filter(r => w2.exists(_._1 == r._2))
    batch1.length shouldBe w1.length
    batch2.length shouldBe w2.length
    batch1.foreach { case (_, id, src, rate) =>
      withClue(s"doc $id pre-republish: ") { rate shouldBe card0(src) }
    }
    batch2.foreach { case (_, id, src, rate) =>
      withClue(s"doc $id post-republish: ") { rate shouldBe card1Final(src) }
    }
    // non-vacuous: at least one source's rate moved between windows
    val moved = batch2.map(_._3).distinct
      .filter(srcName => card1Final(srcName) != card0(srcName))
    moved.length should be > 0
  }

  test("the KL trigger gates the republish: below-threshold drift " +
      "keeps the published card; unseen-source drift is infinite") {
    val arrP = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    val index0 = docsOf(!arrP && col("doc_id") % 10 =!= 7)
    val mass1 = massOf(docsOf(col("doc_id") % 14 === 3 &&
      col("doc_id") % 10 =!= 7))

    val pub = RatePublisher.over(spark, dir, index0)
    val before = pub.rates.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // folding real mass under a huge threshold: accumulated but NOT
    // republished — the monitor saw the drift, judged it tolerable
    pub.fold(mass1, klThresholdNats = 1e9) shouldBe false
    pub.generation shouldBe 1
    pub.driftNats should be > 0.0
    pub.rates.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe before
    // a second fold pushing past the threshold publishes the card
    // computed over EVERYTHING accumulated, not just the last delta
    pub.fold(Map.empty[String, Long], klThresholdNats = 0.0) shouldBe true
    pub.generation shouldBe 2

    // a source the published card has never seen = infinite drift:
    // the trigger always fires
    val pub2 = RatePublisher.over(spark, dir, index0)
    pub2.fold(Map("src_never_seen" -> 10L), klThresholdNats = 1e9) shouldBe true
  }
}
