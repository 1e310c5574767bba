package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming near-dup detection: hits must cross micro-batch
  * boundaries (that's the stateful point) and agree with the batch
  * d3 semantics on what matches. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"word$i").mkString(" ")
  private val nearDup = base + " tail" // superset: 38 of 39 shingles shared
  private val unrelated = (1 to 30).map(i => s"other$i").mkString(" ")
  private val unrelated2 = (1 to 30).map(i => s"alien$i").mkString(" ")

  test("near-dups are detected across micro-batches; unrelated text is not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = hits.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      spark.table("neardup_out").count() shouldBe 0 // nothing matches yet

      // batch 2: a near-dup of doc 1 and a fresh unrelated doc
      input.addData((3L, nearDup), (4L, unrelated2))
      q.processAllAvailable()
      val out = spark.table("neardup_out")
        .select("d1", "d2", "sigMatches")
        .as[(Long, Long, Int)].collect().toSet
      out.map(h => (h._1, h._2)) shouldBe Set((3L, 1L)) // found its original
      all(out.map(_._3)) should be >= 12
    } finally q.stop()
  }

  test("FIFO cap evicts the oldest bucket members, bounding state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    try {
      // three exact copies fill the 2-slot buckets; doc 20 evicts 21's
      // predecessor history as it lands
      input.addData((20L, base)); q.processAllAvailable()
      input.addData((21L, base)); q.processAllAvailable()
      input.addData((22L, base)); q.processAllAvailable()
      // bucket now holds [22, 21] — 20 was evicted; the next copy must
      // match only the surviving two
      input.addData((23L, base)); q.processAllAvailable()
      val partners = spark.table("neardup_evict")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
        .filter(_._1 == 23L).map(_._2)
      partners shouldBe Set(21L, 22L)
    } finally q.stop()
  }

  test("duplicate of a duplicate still resolves against bucket history") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.detect(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_chain")
      .outputMode("append").start()
    try {
      input.addData((10L, base)); q.processAllAvailable()
      input.addData((11L, base)); q.processAllAvailable() // exact dup
      input.addData((12L, base)); q.processAllAvailable() // third copy
      val pairs = spark.table("neardup_chain")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      // 11 matched 10; 12 matched both 10 and 11
      pairs shouldBe Set((11L, 10L), (12L, 10L), (12L, 11L))
    } finally q.stop()
  }
}
