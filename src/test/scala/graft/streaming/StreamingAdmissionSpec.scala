package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming admission pipeline must be the continuous form of
  * b2_corpus_delta: replay the arrival batch through the two
  * in-stream stages (gates + seeded LSH probe) across several
  * micro-batches in a NON-id order, close the window with compact(),
  * and the decision frame — admitted ids, per-source manifest, every
  * intermediate gate — must be bit-identical to the batch b2Fin.
  * Runs at sf0.1 because the dedup/decontam stages are all empty at
  * sf0.01 (parity would be vacuous); the in-stream stage counts are
  * asserted nonzero so the gate demonstrably exercises every drop. */
class StreamingAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  test("replayed arrival batch: streamed admission == b2Fin, every stage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables(spark, dir, "documents")
    val arrPred = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    // deterministic NON-id arrival order: parity must not depend on
    // the replay happening to arrive in doc_id order
    val arrivals = docs.filter(arrPred)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1 * 2654435761L) % 1000003)
    arrivals.length should be > 100
    val index = docs.filter(!arrPred && col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))

    val (rates, quarantine) = StreamingAdmission.publishedStatics(spark, dir)
    val inFlags = MemoryStream[(Long, String, String)]
    val inHits = MemoryStream[(Long, String, String)]
    val flagsQ = StreamingAdmission.gateFlags(
      inFlags.toDF().toDF("doc_id", "source", "text"), rates, quarantine)
      .writeStream.format("memory").queryName("adm_flags")
      .outputMode("append").start()
    val hitsQ = StreamingAdmission.dupHits(
      inHits.toDF().toDF("doc_id", "source", "text"), index)
      .writeStream.format("memory").queryName("adm_hits")
      .outputMode("append").start()
    try {
      // several micro-batches so batch-internal pairs cross them
      arrivals.grouped(arrivals.length / 4 + 1).foreach { chunk =>
        inFlags.addData(chunk.toSeq)
        inHits.addData(chunk.toSeq)
        flagsQ.processAllAvailable()
        hitsQ.processAllAvailable()
      }

      val fin = StreamingAdmission.compact(
        spark.table("adm_flags"), spark.table("adm_hits").toDF())
        .select(col("doc_id"), col("source"), col("n_words"),
          col("sampled"), col("contaminated"), col("dup_index"),
          col("pre"), col("admitted"))
        .collect().map(r => r.getLong(0) -> r).toMap
      val want = graft.queries.BuildQueries.b2Fin(spark, dir)
        .select(col("doc_id"), col("source"), col("n_words"),
          col("sampled"), col("contaminated"), col("dup_index"),
          col("pre"), col("admitted"))
        .collect().map(r => r.getLong(0) -> r).toMap

      fin.keySet shouldBe want.keySet
      def ids(m: Map[Long, org.apache.spark.sql.Row],
          p: org.apache.spark.sql.Row => Boolean) =
        m.collect { case (id, r) if p(r) => id }.toSet
      // every stage, not just the headline
      ids(fin, _.getBoolean(3)) shouldBe ids(want, _.getBoolean(3))   // sampled
      ids(fin, !_.isNullAt(4)) shouldBe ids(want, !_.isNullAt(4))     // contaminated
      ids(fin, !_.isNullAt(5)) shouldBe ids(want, !_.isNullAt(5))     // index dup
      ids(fin, _.getBoolean(6)) shouldBe ids(want, _.getBoolean(6))   // pre
      ids(fin, _.getBoolean(7)) shouldBe ids(want, _.getBoolean(7))   // ADMITTED

      // the parity is non-vacuous at the EVIDENCE level: the streamed
      // hit log carries exactly the batch probes' dup evidence, and
      // both kinds demonstrably fire at sf0.1 (the MANIFEST's
      // dup-batch count is legitimately 0 here — none of the 7
      // arrival-arrival pairs has both members pre-admissible — so
      // the gate lives on the evidence sets, which cannot be empty)
      val hitRows = spark.table("adm_hits")
        .select(col("d1"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val isArr = (id: Long) => id % 7 == 3 && id % 10 != 7
      val streamedPairs = hitRows.filter(h => isArr(h._2))
        .map(h => (math.min(h._1, h._2), math.max(h._1, h._2))).toSet
      val wantPairs = graft.queries.DedupQueries.deltaBatchDupPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .map(h => (math.min(h._1, h._2), math.max(h._1, h._2))).toSet
      streamedPairs shouldBe wantPairs
      streamedPairs.size should be > 0
      val streamedIdxDup = hitRows.filter(h => !isArr(h._2)).map(_._1).toSet
      val wantIdxDup = graft.queries.DedupQueries.deltaIndexDupIds(spark, dir)
        .collect().map(_.getLong(0)).toSet
      streamedIdxDup shouldBe wantIdxDup
      streamedIdxDup.size should be > 0
      ids(want, _.getBoolean(3)).size should be > 0 // sampler fires too

      // per-source admitted manifest (docs + token mass) matches
      def manifest(rows: Iterable[org.apache.spark.sql.Row]) = rows
        .filter(_.getBoolean(7)).groupBy(_.getString(1))
        .view.mapValues(rs => (rs.size, rs.map(_.getLong(2)).sum)).toMap
      manifest(fin.values) shouldBe manifest(want.values)
    } finally { flagsQ.stop(); hitsQ.stop() }
  }
}
