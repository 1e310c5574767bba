package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Executes (not just pins) the Kafka transport claim: a FILE-BACKED
  * streaming source emitting the connector's EXACT 8-field record
  * schema — key/value binary, topic, partition, offset, timestamp,
  * timestampType, headers array<struct<key,value:binary>> — feeds the
  * documented cast into [[StreamingAdmission]]'s two in-stream stages
  * across real micro-batches (maxFilesPerTrigger=1), the window
  * closes with compact(), and the admitted set matches the batch
  * b2 manifest. The only deploy-time delta from production is
  * `.format("kafka")` + the connector jar; everything downstream of
  * `.load()` — the cast, the header map, the gates, the seeded LSH
  * probe, the compaction — is exactly what runs here.
  * (KafkaContractSpec pins the schema/cast contract; this spec runs
  * the admission loop on it end-to-end.) */
class KafkaShapedAdmissionE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** The documented adaptation from a loaded kafka frame to the
    * admission arrival columns: value cast + header map + from_json. */
  private def adapt(kafkaFrame: org.apache.spark.sql.DataFrame) =
    kafkaFrame.selectExpr(
        "CAST(value AS STRING) AS value",
        "map_from_entries(transform(coalesce(headers, array()), " +
          "h -> struct(h.key, CAST(h.value AS STRING)))) AS hdrs")
      .select(from_json(col("value"), StructType.fromDDL(
          "doc_id BIGINT, source STRING, text STRING")).as("d"),
        col("hdrs"))
      .select(col("d.doc_id"), col("d.source"), col("d.text"), col("hdrs"))

  test("kafka-shaped file stream -> admission loop -> batch-parity manifest") {
    val spool = Files.createTempDirectory("graft-kafka-spool")
    spool.toFile.deleteOnExit()
    val docs = graft.Tables(spark, dir, "documents")
    val arrPred = graft.queries.DedupQueries.isDeltaArrival(col("doc_id"))
    // arrivals serialized as kafka records: doc JSON as the message
    // value, gateway delivery id as a record header, id as the key
    docs.filter(arrPred)
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("doc_id"), col("source"), col("text")))
          .cast("binary").as("value"),
        lit("corpus-arrivals").as("topic"),
        (col("doc_id") % 4).cast("int").as("partition"),
        col("doc_id").as("offset"),
        to_timestamp(lit("2025-11-05 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"),
        array(struct(lit("x-delivery-id").as("key"),
          col("doc_id").cast("string").cast("binary").as("value")))
          .as("headers"))
      .repartition(4)
      .write.mode("overwrite").parquet(spool.toString)

    // header round-trip: the delivery id survives the documented map
    val probe = adapt(spark.read.schema(kafkaSchema).parquet(spool.toString))
    val h = probe.select(col("doc_id"),
        element_at(col("hdrs"), "x-delivery-id").as("did"))
      .limit(5).collect()
    h.length should be > 0
    h.foreach(r => r.getString(1) shouldBe r.getLong(0).toString)

    val index = docs.filter(!arrPred && col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))
    val (rates, quarantine) = StreamingAdmission.publishedStatics(spark, dir)

    // one file per trigger -> 4 genuine micro-batches off the stream
    def kafkaStream() = spark.readStream.schema(kafkaSchema)
      .option("maxFilesPerTrigger", 1).parquet(spool.toString)
    val flagsQ = StreamingAdmission.gateFlags(
      adapt(kafkaStream()).drop("hdrs"), rates, quarantine)
      .writeStream.format("memory").queryName("kadm_flags")
      .outputMode("append").start()
    val hitsQ = StreamingAdmission.dupHits(
      adapt(kafkaStream()).drop("hdrs"), index)
      .writeStream.format("memory").queryName("kadm_hits")
      .outputMode("append").start()
    try {
      flagsQ.processAllAvailable()
      hitsQ.processAllAvailable()
      flagsQ.lastProgress.batchId.toInt should be >= 3 // really micro-batched

      val fin = StreamingAdmission.compact(
        spark.table("kadm_flags"), spark.table("kadm_hits").toDF())
      val admitted = fin.filter(col("admitted"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val want = graft.queries.BuildQueries.b2Fin(spark, dir)
        .filter(col("admitted"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      admitted shouldBe want
      admitted.size should be > 0
      // dup evidence demonstrably flowed over the kafka-shaped hops
      spark.table("kadm_hits").count() should be > 0L
    } finally { flagsQ.stop(); hitsQ.stop() }
  }
}
