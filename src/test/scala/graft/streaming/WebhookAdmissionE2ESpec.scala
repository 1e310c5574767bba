package graft.streaming

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Maintenance

/** The PRODUCTION ingest topology end-to-end, every seam real (round
  * 16 — the one composition HttpIngestE2ESpec + StreamingAdmissionSpec
  * left untested between them): real webhook POSTs terminate at
  * [[HttpEnvelopeRelay]], the durable spool streams through the
  * [[StreamingAdmission]] gates (published rates, quarantine, seeded
  * LSH dedup), the window closes with compact(), the admitted docs
  * land in a partitioned SERVING TREE through per-window appends, and
  * one [[Maintenance]] cycle bin-packs the fragmented tree under the
  * writer lease. Gates are parity-checked against the batch b2Fin
  * frame — the webhook transport must change NOTHING about what gets
  * admitted. Runs at sf0.1 (like StreamingAdmissionSpec) so every
  * gate demonstrably fires. */
class WebhookAdmissionE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def post(url: String, body: String): Int = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val os = conn.getOutputStream
    try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
    val status = conn.getResponseCode
    Option(conn.getInputStream).foreach(_.close())
    conn.disconnect()
    status
  }

  test("webhook POST -> spool -> admission gates -> serving sink -> maintenance, " +
      "parity with the batch manifest") {
    val spool = tmp("graft-wa-spool"); val serve = tmp("graft-wa-serve")
    val docs = graft.Tables(spark, dir, "documents")
    val arrPred = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    val arrivals = docs.filter(arrPred)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    arrivals.length should be > 100
    val index = docs.filter(!arrPred && col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))

    // 1. the arrival batch DELIVERS as real webhook POSTs (the doc
    //    rides the envelope body; ALOWARE is the transport route)
    val mapper = new ObjectMapper()
    val relay = HttpEnvelopeRelay.start(spool.toString)
    try {
      val url = s"http://localhost:${relay.port}/webhook/aloware"
      arrivals.foreach { case (id, src, text) =>
        val node = mapper.createObjectNode()
        node.put("doc_id", id); node.put("source", src); node.put("text", text)
        post(url, mapper.writeValueAsString(node)) shouldBe 200
      }
    } finally relay.close()

    // 2. spool -> streaming arrivals -> the two in-stream stages
    val stream = HttpEnvelopeRelay.spoolSource(spark, spool.toString)
      .select(from_json(col("body"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, source STRING, text STRING")).as("d"))
      .select(col("d.doc_id"), col("d.source"), col("d.text"))
    val (rates, quarantine) = StreamingAdmission.publishedStatics(spark, dir)
    val flagsQ = StreamingAdmission.gateFlags(stream, rates, quarantine)
      .writeStream.format("memory").queryName("wa_flags")
      .outputMode("append").start()
    val hitsQ = StreamingAdmission.dupHits(stream, index)
      .writeStream.format("memory").queryName("wa_hits")
      .outputMode("append").start()
    val fin =
      try {
        flagsQ.processAllAvailable(); hitsQ.processAllAvailable()
        StreamingAdmission.compact(
          spark.table("wa_flags"), spark.table("wa_hits").toDF())
      } finally { flagsQ.stop(); hitsQ.stop() }

    // 3. the admitted set is the batch manifest's, bit for bit
    val got = fin.select(col("doc_id"), col("admitted"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = graft.queries.BuildQueries.b2Fin(spark, dir)
      .select(col("doc_id"), col("admitted"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    got shouldBe want
    val admittedIds = want.collect { case (id, true) => id }
    admittedIds.size should be > 0

    // 4. serving sink: admitted docs land partitioned by source in
    //    per-window appends (fragmenting the tree like any continuous
    //    sink), then ONE maintenance cycle bin-packs it under the lease
    val admitted = fin.filter(col("admitted"))
      .select(col("doc_id"), col("source"), col("n_words"))
      .collect()
    admitted.grouped(admitted.length / 3 + 1).foreach { w =>
      w.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        .toDF("doc_id", "source", "n_words")
        .repartition(1).write.mode("append")
        .partitionBy("source").parquet(serve.toString)
    }
    val before = spark.read.parquet(serve.toString)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    before shouldBe admittedIds.toArray.sorted

    val report = Maintenance.run(spark, serving = Seq(Maintenance.ServingTree(
      serve.toString, Seq("source"), Seq("doc_id"), maxRecordsPerFile = 1 << 20)))
    report.compaction.head._2.filesBefore should be >
      report.compaction.head._2.filesAfter
    // the cycle rewrote layout, never content — and released its lease
    spark.read.parquet(serve.toString)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted shouldBe before
    Files.exists(Paths.get(serve.toString + ".lease")) shouldBe false
  }
}
