package graft.streaming

import graft.SparkSpec

/** StreamingTopK must honor the SpaceSaving paper's guarantees
  * against exact counts: every item with true weight > N/m is
  * tracked, every estimate satisfies true ≤ est ≤ true + err, and
  * `guaranteed` hitters really are top-k under any consistent error
  * resolution. Plus the streaming contracts: cross-batch state and
  * the O(m) state bound. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._
  import StreamingTopK.{HeavyHitter, Obs}

  /** Deterministic skewed stream: item i gets ~1000/(i+1) hits
    * (Zipf-ish), two groups, interleaved deterministically. */
  private def zipf(group: String, items: Int): Seq[Obs] =
    (0 until items).flatMap(i =>
      Seq.fill(1000 / (i + 1))(Obs(group, i.toLong, 1L)))

  test("skewed stream across two micro-batches: heavy hitters found, " +
    "SpaceSaving bounds hold vs exact counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (capacity, k) = (16, 5)
    val data = zipf("a", 60) ++ zipf("b", 40)
    // deterministic interleave, split mid-stream so state must carry
    val feed = data.zipWithIndex.sortBy { case (o, i) => (i % 7, i) }.map(_._1)
    val (b1, b2) = feed.splitAt(feed.length / 2)

    val input = MemoryStream[Obs]
    val q = StreamingTopK.topK(input.toDS(), capacity, k)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      val after1 = spark.table("hh_stream").as[HeavyHitter].collect().toSeq
      input.addData(b2); q.processAllAvailable()
      val all = spark.table("hh_stream").as[HeavyHitter].collect().toSeq
      // last batch's emission = appended rows beyond batch 1's
      val finalRows = all.diff(after1)
      val exact = data.groupBy(o => (o.group, o.item))
        .map { case (gi, os) => gi -> os.map(_.weight).sum }
      val n = Map("a" -> zipf("a", 60).size.toLong,
        "b" -> zipf("b", 40).size.toLong)

      finalRows.size shouldBe 2 * k
      finalRows.foreach { h =>
        val t = exact((h.group, h.item))
        withClue(s"$h true=$t: ") {
          h.est should be >= t // overestimate only
          (h.est - h.err) should be <= t // err covers the overshoot
          h.err should be <= n(h.group) / capacity // paper bound
        }
      }
      // the unmistakable hitters (true count far above N/m) must
      // surface as guaranteed top-k
      Seq("a", "b").foreach { g =>
        val got = finalRows.filter(_.group == g).map(_.item).toSet
        (0L to 2L).foreach(i => got should contain(i))
        finalRows.filter(h => h.group == g && h.item <= 2L)
          .foreach(_.guaranteed shouldBe true)
      }
    } finally q.stop()
  }

  test("transition function: state stays O(capacity), eviction inherits " +
    "the minimum, deterministic tie-break") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[StreamingTopK.Summary](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    // capacity 2: items 1,2 fill it; item 3 evicts the min (item 2,
    // est 1) and inherits its count as error
    val out = StreamingTopK.update(2, 2)("g",
      Iterator(Obs("g", 1L, 5L), Obs("g", 2L, 1L), Obs("g", 3L, 1L)), st)
      .toSeq
    val s = st.get
    s.size shouldBe 2
    s(1L) shouldBe ((5L, 0L))
    s(3L) shouldBe ((2L, 1L)) // est = evicted min 1 + weight 1, err = 1
    out.map(_.item) shouldBe Seq(1L, 3L)
    // top-1 of (est 5, err 0) vs next est 2 → guaranteed
    out.head.guaranteed shouldBe true
  }

  test("full summary with <= k tracked items floors 'guaranteed' at the " +
    "min est, not 0 (untracked items can hide up to the inherited min)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[StreamingTopK.Summary](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    // capacity 2 = k 2: item 3 evicts item 2; the summary is FULL and
    // ranked.size == k, so an untracked item (e.g. the evicted 2) may
    // truly hold up to minEst — item 3 (est 2, err 1: certain ≥ only 1)
    // must NOT be 'guaranteed'; item 1 (est-err 5 ≥ 2) must be.
    val out = StreamingTopK.update(2, 2)("g",
      Iterator(Obs("g", 1L, 5L), Obs("g", 2L, 1L), Obs("g", 3L, 1L)), st)
      .toSeq
    out.map(h => h.item -> h.guaranteed).toMap shouldBe
      Map(1L -> true, 3L -> false)
    // a NON-full summary has never evicted: unreported items truly
    // have count 0, so everything tracked is guaranteed
    val st2 = TestGroupState.create[StreamingTopK.Summary](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    val out2 = StreamingTopK.update(8, 2)("g",
      Iterator(Obs("g", 1L, 5L), Obs("g", 2L, 1L)), st2).toSeq
    out2.foreach(_.guaranteed shouldBe true)
  }

  test("batch items fold in item order regardless of arrival order") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def run(obs: Seq[Obs]): StreamingTopK.Summary = {
      val st = TestGroupState.create[StreamingTopK.Summary](
        Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
        hasTimedOut = false)
      StreamingTopK.update(2, 2)("g", obs.iterator, st)
      st.get
    }
    val obs = Seq(Obs("g", 3L, 1L), Obs("g", 1L, 2L), Obs("g", 2L, 2L))
    run(obs) shouldBe run(obs.reverse)
  }
}
