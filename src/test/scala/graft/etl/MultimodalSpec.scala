package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world of bytes", "en", "srcA", 20L),
    (2L, "tiny", "de", "srcB", 4L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mediaFromDocuments produces the typed media schema") {
    val m = Multimodal.mediaFromDocuments(docs)
    m.schema.fieldNames.toSeq shouldBe Seq("media_id", "kind", "bytes", "meta")
    val r = m.filter($"media_id" === 1L).head()
    r.getAs[String]("kind") shouldBe "img/srcA"
    r.getAs[Array[Byte]]("bytes") shouldBe "hello world of bytes".getBytes("UTF-8")
    val meta = r.getStruct(r.fieldIndex("meta"))
    meta.getAs[Long]("n_bytes") shouldBe 20L
    meta.getAs[String]("declared_lang") shouldBe "en"
  }

  test("decodeBatch runs the stub decoder partition-wise and is deterministic") {
    val out = Multimodal.decodeBatch(Multimodal.mediaFromDocuments(docs))
      .collect().sortBy(_.media_id)
    out.map(_.media_id).toSeq shouldBe Seq(1L, 2L)
    val d1 = out(0)
    d1.width shouldBe 4 // sqrt(20)=4.47 -> 4
    d1.height shouldBe 5
    d1.n_frames shouldBe 1 + 20 % 7
    d1.checksum should fullyMatch regex "[0-9a-f]{32}"
    // determinism: same input, same output
    Multimodal.decodeBatch(Multimodal.mediaFromDocuments(docs))
      .collect().sortBy(_.media_id).head.checksum shouldBe d1.checksum
  }

  test("frameSample emits n strided windows of frameLen bytes") {
    val m = Multimodal.mediaFromDocuments(docs).filter($"media_id" === 1L)
    val frames = m.select(Multimodal.frameSample($"bytes", 4, 5).as("f"))
      .head().getSeq[Array[Byte]](0)
    frames.length shouldBe 4
    new String(frames.head, "UTF-8") shouldBe "hello"
    // stride = (20-5)/3 = 5 -> windows at 1,6,11,16
    new String(frames(1), "UTF-8") shouldBe " worl"
    new String(frames(3), "UTF-8") shouldBe "bytes"
  }

  test("resizeStub truncates the payload") {
    val m = Multimodal.mediaFromDocuments(docs)
    val sizes = m.select(
      org.apache.spark.sql.functions.length(Multimodal.resizeStub($"bytes", 8)).as("n"))
      .as[Int].collect().toSet
    sizes shouldBe Set(8, 4) // 20-byte doc truncated to 8; 4-byte kept
  }
}
