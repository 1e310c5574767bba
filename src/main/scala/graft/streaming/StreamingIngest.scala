package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.etl.{Adapters, Dedup, PushSink, RosterGate}

/** Structured-Streaming form of the ingest dataflow (SURVEY §2.9).
  *
  * The batch transforms are reused verbatim — adapters and gate are
  * pure DataFrame functions; only the ledger changes shape: the
  * DynamoDB conditional-put ledger becomes watermarked state dedup
  * (state TTL = the reference's 14-day window), and the Power BI push
  * sink becomes `foreachBatch` so any batch writer (parquet/REST)
  * terminates the stream.
  *
  * Micro-batch trigger stays well under the reference's ≤15 min
  * freshness SLA (`docs/quill_dashboard_schema_design_doc.md:185`).
  *
  * Watermarks: the ledger's 14-day window is a PRODUCT semantic (how
  * long a duplicate is remembered — it must stay 14 days). Any
  * event-time DISORDER allowance layered on this stream (windowed
  * rollups, sessionization over the admitted facts) is a transport
  * property instead, and should come from the e33 lateness audit via
  * [[WatermarkCalibration.calibrate]] — the documented default — not
  * share the TTL. See WatermarkCalibration's scaladoc for why the
  * two constants differ by ~5000× on a healthy transport.
  */
object StreamingIngest {

  /** Transport-agnostic envelope adapter: ANY streaming frame with a
    * single raw-JSON string `value` column becomes the S1 envelope
    * contract (`source, headers, body, receivedAt`) the adapters
    * consume. This is the one seam every live transport plugs into:
    *
    *  - file drop → [[fileSource]] (below)
    *  - TCP relay → [[socketSource]] (below)
    *  - Kafka     → `spark.readStream.format("kafka")
    *      .option("kafka.bootstrap.servers", …).option("subscribe", …)
    *      .load().selectExpr("CAST(value AS STRING) AS value")`
    *      then `lineEnvelopes(_, "ALOWARE")` — the connector jar is a
    *      deploy-time dependency, the engine contract is just this
    *      value column. Record headers, if wanted for P5 delivery-id
    *      dedup, ride along as a pre-mapped `headers` column (kafka
    *      emits array<struct<key,value:binary>>; add
    *      `.option("includeHeaders", "true")` and select
    *      `map_from_entries(transform(coalesce(headers, array()),
    *      h -> struct(h.key, CAST(h.value AS STRING)))) AS headers`
    *      beside the value cast — KafkaContractSpec pins the full
    *      wiring against the connector's documented schema)
    *  - Kinesis/PubSub → same: cast the data blob to string, adapt.
    *
    * Keeping the seam at "a string column" means the whole ingest
    * dataflow (adapters → gate → stateful ledger → sink) is tested
    * once and every transport reuses it unchanged. */
  def lineEnvelopes(lines: DataFrame, source: String): DataFrame =
    lines.select(
      lit(source).as("source"),
      (if (lines.columns.contains("headers")) col("headers")
       else map()).cast("map<string,string>").as("headers"),
      col("value").as("body"),
      current_timestamp().as("receivedAt"))

  /** File-drop source of raw webhook JSON (the S3/landing-zone
    * deployment of SURVEY §2.1 S1-S3): one JSON object per line. */
  def fileSource(spark: SparkSession, dir: String, source: String): DataFrame =
    lineEnvelopes(
      spark.readStream.schema("value STRING").text(dir), source)

  /** Live TCP source (the webhook-relay deployment of S1: an HTTP
    * terminator forwards each delivery as one JSON line over a
    * socket). Spark's built-in socket source; NOT replayable — pair
    * with an at-least-once relay or prefer Kafka in production; the
    * stateful ledger absorbs redeliveries either way. */
  def socketSource(spark: SparkSession, host: String, port: Int,
      source: String): DataFrame =
    lineEnvelopes(
      spark.readStream.format("socket")
        .option("host", host).option("port", port.toString).load(),
      source)

  /** envelope stream → admitted FactEvent stream (dedup incl. the
    * 14-day cross-batch ledger window). */
  def transform(
      envelopes: DataFrame, roster: Option[DataFrame],
      ttlDays: Int = 14): DataFrame = {
    val adapted = Adapters.route(envelopes)
    val gated = RosterGate(adapted, roster)
    // D1 and D2 collapse into one stateful dedup: within-batch and
    // cross-batch duplicates are the same key in the state store.
    Dedup.streamingLedgerDedup(gated, "receivedAt", ttlDays)
  }

  /** K1 — append sink via foreachBatch: parquet here; swap the body
    * for the Power BI REST pusher in production (same contract —
    * at-least-once per micro-batch, idempotent by eventId). */
  def parquetSink(
      facts: DataFrame, outPath: String, checkpoint: String,
      triggerMs: Long = 10000): DataStreamWriter[Row] =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outPath)
      }

  /** K1/K2 — the production push sink: every micro-batch goes through
    * [[PushSink.pushBatch]] (rename, chunk, retry with backoff, token
    * -bucket rate cap — all executor-side). Semantics: at-least-once
    * per micro-batch (a task retry may re-push a chunk); the sink
    * contract is idempotent by EventID, same as the reference's
    * conditional-put, so replays are absorbed downstream. A push
    * failure that exhausts retries fails the batch and the stream
    * halts rather than dropping rows. */
  def pushSink(
      facts: DataFrame, checkpoint: String, pusher: PushSink.RowPusher,
      table: String = "FactEvent", chunkSize: Int = 100,
      retry: PushSink.RetryPolicy = PushSink.RetryPolicy(),
      rateLimit: Option[PushSink.RateLimit] = None,
      numPartitions: Option[Int] = None,
      triggerMs: Long = 10000): DataStreamWriter[Row] =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        PushSink.pushBatch(batch, pusher, table, chunkSize, retry,
          rateLimit, numPartitions)
        ()
      }
}
