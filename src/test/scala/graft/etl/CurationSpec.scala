package graft.etl

import graft.SparkSpec

/** The composed curation pipeline: each planted defect is removed by
  * exactly the stage built for it, and the attrition report ledgers
  * every removal. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over a lazy dog and then " +
    "it runs off to the woods in a hurry because the hunt is on tonight"
  private val goodDup = good.toUpperCase + "!!!" // normalizes to `good`
  private val goodNear = good + " extra trailing clause here to shift it"
  private val nonEnglish = (1 to 30).map(i => s"wort$i").mkString(" ")
  private val tooShort = "the cat is in it"

  test("each stage removes its planted defect; report ledgers the attrition") {
    val docs = Seq(
      (1L, good), (2L, goodDup), (3L, goodNear),
      (4L, nonEnglish), (5L, tooShort))
      .toDF("doc_id", "text")

    val r = Curation.run(docs, minWords = 10)
    val kept = r.curated.select("id").as[Long].collect().toSet

    // 4 dies at the language gate, 5 at the quality gate, 2 at exact
    // dedup (case/punctuation normalize to doc 1), 3 at near-dedup
    // (minhash cluster with doc 1, canonical = min id = 1)
    kept shouldBe Set(1L)
    r.report.map(s => s.stage -> s.docs) shouldBe Seq(
      "input" -> 5L, "lang_gate" -> 4L, "quality_gate" -> 3L,
      "exact_dedup" -> 2L, "near_dedup" -> 1L)
  }

  test("release() frees the curated cache; intermediates are freed per stage") {
    val docs = (1L to 6L).map(i =>
      (i, (1 to 25).map(j => s"the word${i}x$j of it").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Curation.run(docs)
    // run() materializes every stage and releases each input cache as
    // its successor lands, so by return only the curated corpus is
    // still cached...
    r.curated.storageLevel.useMemory shouldBe true
    // ...and release() frees that too, leaving it evaluable
    r.release()
    r.curated.storageLevel shouldBe org.apache.spark.storage.StorageLevel.NONE
    r.curated.count() shouldBe 6
  }

  test("a clean corpus passes through unchanged") {
    val docs = (1L to 6L).map(i =>
      (i, (1 to 25).map(j => s"the word${i}x$j of it").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Curation.run(docs)
    r.curated.count() shouldBe 6
    r.report.last.docs shouldBe 6
  }
}
