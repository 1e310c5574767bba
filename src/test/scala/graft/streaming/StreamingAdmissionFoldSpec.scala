package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The admission loop's FEEDBACK edge (round 14): after a window
  * closes, its arrivals are folded into the admission index
  * (b4_index_fold's durable form; here the in-memory union the next
  * window seeds from), so the NEXT window's probes dedup against them
  * — in particular, a new arrival near-dup to a PREVIOUS window's
  * ADMITTED doc must surface as INDEX-dup evidence and be dropped.
  * Without the fold the same doc sails through (gated below: the
  * no-fold leg demonstrably re-admits it).
  *
  * Runs at sf0.1; the arrival set (doc_id % 7 = 3, bench excluded) is
  * split into two consecutive windows by doc_id % 14 (window 1 =
  * residue 3, window 2 = residue 10) — ground-truthed to carry
  * cross-window near-dup pairs whose window-1 member is admitted. */
class StreamingAdmissionFoldSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"
  private val win1 = (id: Long) => id % 14 == 3 && id % 10 != 7
  private val win2 = (id: Long) => id % 7 == 3 && id % 14 != 3 && id % 10 != 7

  /** MinHash signature frame over (doc_id, text) — the d3 pipeline's
    * sig shape, rebuilt here so the spec's expectations are an
    * independent recomputation of what the streamed probe must emit. */
  private def sigs(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .filter(expr("size(w) >= 3"))
    .withColumn("xs", graft.operators.TextDedup.shingleHashes("w", 3))
    .select(col("doc_id"),
      graft.operators.TextDedup.minhashSig("xs", 16).as("sig"))

  private def confirmedTwoSided(delta: DataFrame, index: DataFrame) =
    graft.operators.TextDedup
      .lshCandidatesTwoSided(sigs(delta), sigs(index), "doc_id",
        k = 16, bands = 4)
      .withColumn("m",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("m") >= 12).select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def confirmedWithin(d: DataFrame) =
    graft.operators.TextDedup
      .lshCandidates(sigs(d), "doc_id", k = 16, bands = 4)
      .withColumn("m",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("m") >= 12).select(col("d1"), col("d2"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet

  test("two consecutive windows: window 2's index-dup evidence sees " +
      "window 1's admits; without the fold they are re-admitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val index0 = docs.filter(!graft.queries.DedupQueries
      .isDeltaArrival(col("doc_id")) && col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))
    val w1Docs = docs.filter(col("doc_id") % 14 === 3 &&
      col("doc_id") % 10 =!= 7)
    val w2Docs = docs.filter(col("doc_id") % 7 === 3 &&
      col("doc_id") % 14 =!= 3 && col("doc_id") % 10 =!= 7)
    val (rates, quarantine) = StreamingAdmission.publishedStatics(spark, dir)

    /** Replay one window: arrivals through gates + seeded probe +
      * compact against `index`; returns (decision rows, hit pairs). */
    def window(name: String, arrivals: DataFrame, index: DataFrame,
        isWindowArrival: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val rows = arrivals.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(t => (t._1 * 2654435761L) % 1000003) // non-id order
      val inF = MemoryStream[(Long, String, String)]
      val inH = MemoryStream[(Long, String, String)]
      val fq = StreamingAdmission.gateFlags(
        inF.toDF().toDF("doc_id", "source", "text"), rates, quarantine)
        .writeStream.format("memory").queryName(s"${name}_flags")
        .outputMode("append").start()
      val hq = StreamingAdmission.dupHits(
        inH.toDF().toDF("doc_id", "source", "text"), index)
        .writeStream.format("memory").queryName(s"${name}_hits")
        .outputMode("append").start()
      try {
        rows.grouped(rows.length / 3 + 1).foreach { chunk =>
          inF.addData(chunk.toSeq); inH.addData(chunk.toSeq)
          fq.processAllAvailable(); hq.processAllAvailable()
        }
        val fin = StreamingAdmission.compact(
          spark.table(s"${name}_flags"),
          spark.table(s"${name}_hits").toDF(), isWindowArrival)
          .select(col("doc_id"), col("dup_index").isNotNull.as("dup_index"),
            col("admitted")).collect()
          .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2)))
          .toMap
        val hits = spark.table(s"${name}_hits")
          .select(col("d1"), col("d2")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (fin, hits)
      } finally { fq.stop(); hq.stop() }
    }

    // WINDOW 1 against the ingested index
    val (fin1, _) = window("w1", w1Docs, index0,
      c => c % 14 === 3 && c % 10 =!= 7)
    val admitted1 = fin1.collect { case (id, (_, true)) => id }.toSet
    admitted1.size should be > 0

    // FOLD (the feedback edge): everything SEEN in window 1 joins the
    // index — the in-memory twin of b4's durable signature append
    val index1 = index0.unionByName(w1Docs.select(col("doc_id"), col("text")))

    // WINDOW 2 against the FOLDED index
    val (fin2, hits2) = window("w2", w2Docs, index1,
      c => c % 7 === 3 && c % 14 =!= 3 && c % 10 =!= 7)

    // the streamed evidence is exactly the batch probe's, index side
    // now including window 1 (independent recomputation)
    val expIdx2 = confirmedTwoSided(w2Docs, index1.toDF())
    val expIn2 = confirmedWithin(w2Docs)
    val gotIdx2 = hits2.filter(h => !win2(h._2))
    val gotIn2 = hits2.filter(h => win2(h._2))
      .map(h => (math.min(h._1, h._2), math.max(h._1, h._2)))
    gotIdx2 shouldBe expIdx2
    gotIn2 shouldBe expIn2

    // THE GATE: window 2's index-dup evidence includes hits against
    // window 1 ADMITS, and those arrivals are dropped as index dups
    val hitsOnW1Admits = gotIdx2.filter(h => admitted1.contains(h._2))
    hitsOnW1Admits.size should be > 0
    hitsOnW1Admits.foreach { case (d1, _) =>
      withClue(s"doc $d1 (near-dup of a window-1 admit): ") {
        fin2(d1)._1 shouldBe true  // dup_index
        fin2(d1)._2 shouldBe false // not admitted
      }
    }

    // COUNTERFACTUAL: replay window 2 against the UNFOLDED index.
    // At this SF the sampler independently drops the near-dup docs
    // (no arr-arr pair has both members pre-admissible — the r12
    // manifest precedent), so the observable regression is at the
    // dup_index STAGE: without the fold, a near-dup of a window-1
    // admit carries NO index-dup evidence at all — on a corpus where
    // it passed sampling it would be re-admitted.
    val (fin2NoFold, _) = window("w2nf", w2Docs, index0,
      c => c % 7 === 3 && c % 14 =!= 3 && c % 10 =!= 7)
    val flipped = hitsOnW1Admits.map(_._1)
      .filter(id => !fin2NoFold(id)._1) // dup_index false without fold
    flipped.size should be > 0
    // and folding never loosens a decision: every doc admitted WITH
    // the fold was admitted without it too
    fin2.collect { case (id, (_, true)) => id }.foreach { id =>
      fin2NoFold(id)._2 shouldBe true
    }
  }

  test("admission probe checkpoint-restart: the seeded LSH state is " +
      "recovered, cross-restart pairs still emit") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft-adm-in")
    val chk = Files.createTempDirectory("graft-adm-chk")
    val out = Files.createTempDirectory("graft-adm-out")
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val index0 = docs.filter(!graft.queries.DedupQueries
      .isDeltaArrival(col("doc_id")) && col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))
    val w1Docs = docs.filter(col("doc_id") % 14 === 3 &&
      col("doc_id") % 10 =!= 7)
    val w2Docs = docs.filter(col("doc_id") % 7 === 3 &&
      col("doc_id") % 14 =!= 3 && col("doc_id") % 10 =!= 7)

    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, source STRING, text STRING")
        .json(in.toString)
      StreamingAdmission.dupHits(stream, index0).toDF()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", chk.toString)
        .outputMode("append").start()
    }

    // leg 1: window-1 arrivals, then KILL the query
    w1Docs.coalesce(1).write.mode("append").json(in.toString)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // leg 2: a NEW query resumes from the checkpoint — the probe
    // state (index seed + window-1 arrivals) must be recovered, not
    // re-initialized from scratch mid-stream
    w2Docs.coalesce(1).write.mode("append").json(in.toString)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out.toString)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // the restarted run's total evidence equals the uninterrupted
    // batch expectation: arrivals vs index + all arrival-internal
    // pairs (later member probes the earlier one's recovered state)
    val allArr = w1Docs.unionByName(w2Docs)
    val expIdx = confirmedTwoSided(allArr, index0.toDF())
    val expIn = confirmedWithin(allArr)
    val isArr = (id: Long) => id % 7 == 3 && id % 10 != 7
    got.filter(h => !isArr(h._2)) shouldBe expIdx
    got.filter(h => isArr(h._2))
      .map(h => (math.min(h._1, h._2), math.max(h._1, h._2))) shouldBe expIn

    // non-vacuous: at least one pair STRADDLES the restart — its
    // window-1 member lives only in recovered state
    val straddling = got.filter { case (d1, d2) =>
      (win1(d1) && win2(d2)) || (win2(d1) && win1(d2))
    }
    straddling.size should be > 0
  }
}
