package graft.etl

import org.apache.spark.sql.{DataFrame, Row}

/** K1/K2 — the push-dataset row sink contract (reference
  * `src/services/post-factevent.service.ts`,
  * `src/integrations/powerbi/tables.repo.ts`): rows are renamed to
  * the sink schema (P8), serialized row-wise, and pushed in bounded
  * chunks (the reference's SDK "chunking, retries, rate-limited"
  * claim, `README.md:69,265`).
  *
  * The transport is injected ([[RowPusher]]) — production wires an
  * HTTP client; tests wire a recorder. `foreachBatch`-friendly:
  * chunking happens per partition on executors, so no driver
  * collect; the pusher must be serializable (an HTTP client per
  * partition is the standard shape).
  */
object PushSink {

  trait RowPusher extends Serializable {
    /** Push one chunk of JSON-encoded rows to a named sink table. */
    def push(table: String, chunk: Seq[String]): Unit
  }

  /** P8 — FactEvent rows → sink column names, notes defaulted to "". */
  def toSinkColumns(facts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    facts.select(
      col("eventId").as("EventID"),
      col("agentId").as("AgentID"),
      date_format(col("factDateKey"), "yyyy-MM-dd").as("FactDateKey"),
      col("metricId").as("MetricID"),
      coalesce(col("notes"), lit("")).as("Notes"))
  }

  /** Push a (micro-)batch: executor-side, chunked. Returns rows pushed. */
  def pushBatch(
      facts: DataFrame, pusher: RowPusher, table: String = "FactEvent",
      chunkSize: Int = 100): Long = {
    import org.apache.spark.sql.functions._
    val sink = toSinkColumns(facts)
    val pushed = sink.select(to_json(struct(sink.columns.map(col): _*)).as("j"))
      .repartition(math.max(1, facts.sparkSession.sparkContext.defaultParallelism))
    val counts = pushed.rdd.mapPartitions { it =>
      var n = 0L
      it.map(_.getString(0)).grouped(chunkSize).foreach { chunk =>
        pusher.push(table, chunk.toSeq); n += chunk.size
      }
      Iterator.single(n)
    }
    counts.collect().sum
  }
}
