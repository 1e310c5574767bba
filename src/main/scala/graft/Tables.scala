package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst pushes filters and
  * prunes columns into the scan (`PushedFilters` / `ReadSchema`). At
  * cluster scale the same API reads a partitioned table root; nothing
  * here assumes single-file layout.
  */
object Tables {
  /** Epoch-nanos literal for an ISO date/datetime (UTC) — filter the
    * raw `ts_ns` long with these so the predicate pushes down to the
    * parquet scan (a range on the DERIVED µs `ts` column cannot push:
    * `.explain` shows bare `PushedFilters: [IsNotNull(ts)]`).
    * `ts >= T` on the floor-divided µs column ⟺ `ts_ns >= T_µs*1000`
    * for the non-negative timestamps in this data. */
  def nanos(iso: String): Long = {
    val ldt =
      if (iso.length == 10) java.time.LocalDate.parse(iso).atStartOfDay()
      else java.time.LocalDateTime.parse(iso.replace(' ', 'T'))
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
  }

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one test table. `events` needs special handling: the driver
    * wrote `ts` as parquet TIMESTAMP(NANOS) which Spark rejects by
    * default; we read it as a long (nanos since epoch) and expose both
    * the raw `ts_ns` and a microsecond-truncated `ts` timestamp —
    * identical to DuckDB's `make_timestamp(epoch_ns(ts)//1000)`.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark) // idempotent; graft_* in scope

    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
