package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the EXACT wiring a production deployment uses to run the
  * ingest dataflow off Kafka — without kafka jars (none ship in this
  * container, and the engine contract deliberately does not need
  * them): `spark.readStream.format("kafka")` yields a fixed, publicly
  * documented schema, so a frame with that schema IS the connector
  * contract. These tests feed Kafka-SHAPED records through the same
  * `lineEnvelopes` seam every other transport uses and prove the full
  * dataflow (adapters → gate → stateful ledger → sink) runs on them
  * unchanged. The only deploy-time delta is the format string and the
  * connector jar on the classpath:
  *
  * {{{
  * spark.readStream.format("kafka")
  *   .option("kafka.bootstrap.servers", brokers)
  *   .option("subscribe", topic)
  *   .option("includeHeaders", "true")       // only for delivery-id dedup
  *   .load()                                  // ← the schema pinned below
  *   .selectExpr("CAST(value AS STRING) AS value",
  *     headersAsMapExpr + " AS headers")      // headers ride along
  * }}}
  */
class KafkaContractSpec extends SparkSpec {
  import spark.implicits._

  /** The kafka source's fixed output schema (Structured Streaming +
    * Kafka Integration Guide; stable across Spark 2.x–4.x). */
  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    // present when .option("includeHeaders", "true")
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** One kafka-shaped record: the raw webhook JSON as the message
    * value, gateway delivery id as a record header. */
  private def kafkaRecords(rows: Seq[(String, Seq[(String, String)])]): DataFrame = {
    val data = rows.zipWithIndex.map { case ((json, hdrs), i) =>
      org.apache.spark.sql.Row(
        s"k$i".getBytes("UTF-8"), json.getBytes("UTF-8"),
        "webhooks", 0, i.toLong,
        java.sql.Timestamp.valueOf("2025-11-05 10:00:00"), 0,
        hdrs.map { case (k, v) =>
          org.apache.spark.sql.Row(k, v.getBytes("UTF-8")) })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), kafkaSchema)
  }

  test("kafka schema -> lineEnvelopes: the documented cast produces " +
      "the exact envelope contract") {
    val records = kafkaRecords(Seq(
      ("""{"event":"outbound_call","body":{"id":1,"owner_id":10}}""", Nil)))
    val envelopes = StreamingIngest.lineEnvelopes(
      records.selectExpr("CAST(value AS STRING) AS value"), "ALOWARE")

    val schema = envelopes.schema
    schema.fieldNames.toSeq shouldBe
      Seq("source", "headers", "body", "receivedAt")
    schema("source").dataType shouldBe StringType
    schema("headers").dataType shouldBe MapType(StringType, StringType)
    schema("body").dataType shouldBe StringType
    schema("receivedAt").dataType shouldBe TimestampType

    val row = envelopes.select(col("source"), col("body")).head()
    row.getString(0) shouldBe "ALOWARE"
    row.getString(1) should include("outbound_call")
  }

  /** Kafka record headers → envelope `headers` map, so the gateway's
    * X-Delivery-Id reaches P5's delivery-id dedup. Record header
    * values are BINARY (kafka contract); the envelope wants
    * map<string,string>. */
  private val headersAsMapExpr =
    "map_from_entries(transform(coalesce(headers, " +
      "array()), h -> struct(h.key, CAST(h.value AS STRING))))"

  test("kafka record headers flow into the envelope and P5 " +
      "delivery-id dedup sees them") {
    val records = kafkaRecords(Seq(
      ("""{"event":"outbound_call","body":{"id":7,"owner_id":10}}""",
        Seq("X-DELIVERY-ID" -> "dd-1")), // shouting gateway casing
      ("""{"event":"outbound_call","body":{"id":7,"owner_id":10}}""",
        Seq("X-Delivery-Id" -> "dd-1"))))
    val envelopes = StreamingIngest.lineEnvelopes(
      records.selectExpr("CAST(value AS STRING) AS value",
        headersAsMapExpr + " AS headers"), "ALOWARE")

    envelopes.select(col("headers")("X-DELIVERY-ID")).as[String]
      .collect().toSet shouldBe Set("dd-1", null)
    // the adapter's case-insensitive header lookup resolves both
    val adapted = graft.etl.Adapters.route(envelopes)
    adapted.select("eventId").as[String].collect().toSet shouldBe
      Set("ALOWARE:7")
  }

  test("kafka-shaped stream end-to-end: adapters -> gate -> stateful " +
      "ledger -> facts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // MemoryStream carries the kafka value payload (binary, like the
    // connector emits); the wiring under test is the same selectExpr
    // cast + lineEnvelopes
    val input = MemoryStream[Array[Byte]]
    val valueFrame = input.toDF().select(col("value"))
    val envelopes = StreamingIngest.lineEnvelopes(
      valueFrame.selectExpr("CAST(value AS STRING) AS value"), "ALOWARE")
    val facts = StreamingIngest.transform(envelopes, roster = None)
    val out = java.nio.file.Files.createTempDirectory("graft-kafka-out")
    val chk = java.nio.file.Files.createTempDirectory("graft-kafka-chk")
    val q = StreamingIngest.parquetSink(
      facts, out.toString, chk.toString, triggerMs = 100).start()
    try {
      input.addData(Seq(
        """{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:00:00"}}""",
        """{"event":"outbound_call","body":{"id":1,"owner_id":10,"created_at":"2025-11-05 10:00:01"}}""",
        """{"event":"inbound_call","body":{"id":2,"owner_id":11}}""",
        """{"event":"outbound_text","body":{"id":3,"owner_id":11,"created_at":"2025-11-05 10:00:02"}}""")
        .map(_.getBytes("UTF-8")))
      q.processAllAvailable()
    } finally q.stop()

    spark.read.parquet(out.toString).select("eventId").as[String]
      .collect().sorted shouldBe Array("ALOWARE:1", "ALOWARE:3")
  }
}
