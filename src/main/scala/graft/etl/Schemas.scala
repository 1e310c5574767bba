package graft.etl

import org.apache.spark.sql.types._

/** Canonical schemas of the star-schema ETL (reference:
  * `src/domain/types.ts:1-65`, `tools/pbi/create-dataset.ts:48-107`;
  * see SURVEY.md §1.3). FactDateKey is `DateType` on BOTH fact and
  * DimDate sides, fixing the reference's String-vs-Datetime join
  * mismatch (SURVEY §1.3).
  */
object Schemas {

  /** One webhook delivery (reference `src/domain/types.ts:3-8`):
    * `body` stays a raw JSON string until the adapter parses it with
    * a permissive schema — the schemaless boundary of §1.2. */
  val envelope: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("body", StringType),
    StructField("receivedAt", TimestampType)))

  /** Aloware webhook payload fields the dataflow reads
    * (FIXTURES.md §1; reference `src/adapters/aloware.adapter.ts:55-99`). */
  private val alowarePayloadFields: Seq[StructField] = Seq(
    StructField("id", LongType),
    StructField("uuid_v4", StringType),
    StructField("direction", IntegerType),
    StructField("type", IntegerType),
    StructField("created_at", StringType),
    StructField("owner_id", LongType),
    StructField("user_id", LongType),
    StructField("contact", StructType(Seq(StructField("timezone", StringType)))))

  val alowarePayload: StructType = StructType(alowarePayloadFields)

  /** Tolerant read schema for the three accepted envelope shapes —
    * bare payload, `{event, body}`, `{parsedBody: {event, body}}`
    * (reference `src/adapters/aloware.adapter.ts:55-58`). Absent
    * branches are simply null after permissive `from_json`. */
  val alowareBody: StructType = StructType(
    Seq(
      StructField("event", StringType),
      StructField("body", alowarePayload),
      StructField("parsedBody", StructType(Seq(
        StructField("event", StringType),
        StructField("body", alowarePayload))))
    ) ++ alowarePayloadFields)

  /** FactEvent at the normalized grain: one row per event, PK EventID
    * (reference `src/domain/types.ts:12-18`). */
  val factEvent: StructType = StructType(Seq(
    StructField("eventId", StringType, nullable = false),
    StructField("agentId", StringType, nullable = false),
    StructField("factDateKey", DateType),
    StructField("metricId", StringType, nullable = false),
    StructField("notes", StringType),
    StructField("source", StringType),
    StructField("receivedAt", TimestampType),
    StructField("dedupKey", StringType)))

  val dimAgent: StructType = StructType(Seq(
    StructField("AgentID", StringType, nullable = false),
    StructField("AgentName", StringType),
    StructField("Email", StringType),
    StructField("TimezoneIANA", StringType),
    StructField("ActiveFlag", BooleanType)))

  val dimMetric: StructType = StructType(Seq(
    StructField("MetricID", StringType, nullable = false),
    StructField("MetricName", StringType),
    StructField("DefaultGoal", LongType),
    StructField("DefaultYellowFloorPct", DoubleType)))

  /** Idempotency-ledger row (reference `docs/dynamodb_schema.md:11-20`):
    * pk = "SOURCE:eventId", TTL via epoch-seconds expiresAt. */
  val ledger: StructType = StructType(Seq(
    StructField("pk", StringType, nullable = false),
    StructField("seenAt", TimestampType),
    StructField("expiresAt", LongType)))
}

/** Typed rows for Dataset[T] use where type safety helps (§1.2). */
case class FactEvent(
    eventId: String, agentId: String, factDateKey: java.sql.Date,
    metricId: String, notes: String, source: String,
    receivedAt: java.sql.Timestamp, dedupKey: String)

case class LedgerEntry(pk: String, seenAt: java.sql.Timestamp, expiresAt: Long)
