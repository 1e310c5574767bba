package graft.streaming

import graft.SparkSpec

/** StreamingBoilerplate must agree with the batch t24 profile on the
  * same corpus (batch parity), emit each key exactly once across
  * batches, and keep the promised state bound (id set only below the
  * threshold; flag only above). */
class StreamingBoilerplateSpec extends SparkSpec {
  import spark.implicits._
  import StreamingBoilerplate.{BoilerKey, ChunkObs, KeyState}

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed detection emits exactly the batch boilerplate keys " +
    "(df >= 2), each once, across a mid-corpus batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // batch ground truth: chunk keys with >= 2 distinct docs per source
    val expected = StreamingBoilerplate.chunks(docs)
      .groupBy(col("source"), col("ck"))
      .agg(countDistinct(col("docId")).as("df"))
      .filter(col("df") >= 2)
      .select(col("source"), col("ck"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    expected.nonEmpty shouldBe true // the corpus has duplicate structure

    val obs = StreamingBoilerplate.chunks(docs).collect().toSeq
    val (b1, b2) = obs.splitAt(obs.length / 2) // keys straddle batches
    val input = MemoryStream[ChunkObs]
    val q = StreamingBoilerplate.detect(input.toDS(), threshold = 2)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // a third replay of batch 2 must add nothing (flagged keys stay quiet)
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("boiler_stream").as[BoilerKey].collect().toSeq
    emitted.map(k => (k.source, k.ck)).toSet shouldBe expected
    emitted.size shouldBe expected.size // exactly once each
    emitted.foreach(_.df should be >= 2L)
  }

  test("state transition: id set bounded below threshold, collapses to " +
    "a flag at crossing, TTL eviction removes quiet keys") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def fresh() = TestGroupState.create[KeyState](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    val k = ("src0", "ckhash")

    // below threshold: state carries the (sorted) id set, no emission
    val st = fresh()
    StreamingBoilerplate.update(3)(k,
      Iterator(ChunkObs("src0", "ckhash", 7L), ChunkObs("src0", "ckhash", 5L)),
      st).toSeq shouldBe empty
    st.get shouldBe KeyState(flagged = false, Seq(5L, 7L))

    // crossing: one emission with the distinct count, set dropped
    val out = StreamingBoilerplate.update(3)(k,
      Iterator(ChunkObs("src0", "ckhash", 9L)), st).toSeq
    out shouldBe Seq(BoilerKey("src0", "ckhash", 3L))
    st.get shouldBe KeyState(flagged = true, Seq.empty)

    // post-crossing: quiet forever
    StreamingBoilerplate.update(3)(k,
      Iterator(ChunkObs("src0", "ckhash", 11L)), st).toSeq shouldBe empty

    // duplicate doc ids never inflate df
    val st2 = fresh()
    StreamingBoilerplate.update(3)(k,
      Iterator(ChunkObs("src0", "ckhash", 1L), ChunkObs("src0", "ckhash", 1L),
        ChunkObs("src0", "ckhash", 1L)), st2).toSeq shouldBe empty
    st2.get.seen shouldBe Seq(1L)

    // timed-out state is removed
    val st3 = TestGroupState.create[KeyState](
      Optional.of(KeyState(flagged = false, Seq(1L))),
      GroupStateTimeout.ProcessingTimeTimeout(), 0L, Optional.of(1000L),
      hasTimedOut = true)
    StreamingBoilerplate.update(3, stateTtlMs = 1000)(k,
      Iterator.empty, st3).toSeq shouldBe empty
    st3.isRemoved shouldBe true
  }
}
