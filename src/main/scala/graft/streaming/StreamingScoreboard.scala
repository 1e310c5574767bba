package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Continuously-served scoreboard — the streaming analog of the
  * reference's dashboard refresh: instead of batch-recomputing the
  * whole FactDailyMetric rollup every 15 minutes, the counts are a
  * watermarked streaming aggregation in UPDATE mode, and every
  * micro-batch upserts only the (agent, metric, day) groups that
  * changed into a serving store.
  *
  * Scale/state story: streaming state = one count per open
  * (agent, metric, day) group. The watermark is declared ON the
  * business-day key itself (cast to a midnight timestamp): a
  * watermarked column only drives state eviction when it is part of
  * the grouping key, so watermarking arrival time while grouping on
  * (agent, metric, day) would retain every group forever. With the
  * day key watermarked, groups whose day falls `lateness` behind the
  * newest day seen are evicted and later rows for them dropped —
  * state is the working set of ACTIVE days, not history. Update mode
  * means a burst touching one agent re-emits one row, not the whole
  * board. The serving sink
  * receives (key, new value) pairs — any KV/OLAP store with upsert
  * semantics serves reads; the injected [[Upsert]] keeps it testable
  * (production wires the push-dataset or a KV client; same
  * at-least-once + idempotent-by-key contract as PushSink).
  */
object StreamingScoreboard {

  trait Upsert extends Serializable {
    /** Replace the value for a scoreboard key with the new count. */
    def upsert(agentId: String, metricId: String, day: java.sql.Date,
        nEvents: Long): Unit
  }

  /** facts(agentId, metricId, factDateKey: date, receivedAt: ts)
    * stream → update-mode counts per (agent, metric, day).
    *
    * `lateness` is in BUSINESS-DAY time: how far behind the newest
    * day seen a day's count stays open for late arrivals (default two
    * days — yesterday's board absorbs stragglers, last week's is
    * frozen and its state freed). */
  def counts(facts: DataFrame, lateness: String = "2 days"): DataFrame =
    facts
      .withColumn("__day_ts", col("factDateKey").cast("timestamp"))
      .withWatermark("__day_ts", lateness)
      .groupBy(col("agentId"), col("metricId"), col("__day_ts"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("agentId"), col("metricId"),
        col("__day_ts").cast("date").as("factDateKey"), col("n_events"))

  /** Serve via foreachBatch: each micro-batch carries only changed
    * groups (update mode); rows fan out partition-wise to the store. */
  def serve(counts: DataFrame, sink: Upsert, checkpoint: String,
      triggerMs: Long = 10000): DataStreamWriter[Row] =
    counts.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("agentId", "metricId", "factDateKey", "n_events")
          .foreachPartition { (rows: Iterator[Row]) =>
            rows.foreach { r =>
              sink.upsert(r.getString(0), r.getString(1), r.getDate(2),
                r.getLong(3))
            }
          }
      }
}
