package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The schema-adaptive events reader: the driver has regenerated
  * testdata with a DIFFERENT physical `ts` encoding mid-build once
  * already (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) NTZ, round 7), and
  * the hard-coded shim cost a full round. This spec pins the
  * contract for every encoding the reader supports: identical
  * (ts_ns, ts) values, a stable column order, and range bounds that
  * reach the parquet scan as pushed filters. */
class TablesSpec extends SparkSpec {

  // two instants, as epoch micros (UTC): 2024-01-01 00:00:00 and
  // 2024-01-02 03:04:05.123456
  private val us1 = 1704067200000000L
  private val us2 = 1704164645123456L

  private val rest = Seq(
    ("event_type", StringType), ("value", DoubleType), ("props", StringType))

  /** Write a 2-row events.parquet with `ts` in the given physical
    * type; returns the directory. */
  private def writeEvents(tsType: DataType, tsVals: Seq[Any]): String = {
    val dir = Files.createTempDirectory("graft-tables").toString
    val schema = StructType(
      StructField("event_id", LongType) ::
        StructField("ts", tsType) ::
        StructField("user_id", LongType) ::
        rest.map { case (n, t) => StructField(n, t) }.toList)
    val rows = Seq(
      Row(1L, tsVals(0), 10L, "click", 1.5, """{"k":1}"""),
      Row(2L, tsVals(1), 20L, "view", 2.5, """{"k":2}"""))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ntz(us: Long) = java.time.LocalDateTime
    .ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC)
  private def ltz(us: Long) = java.time.Instant
    .ofEpochSecond(us / 1000000L, (us % 1000000L).toInt * 1000)

  private val encodings: Seq[(String, String)] = Seq(
    "nanos-long" -> writeEvents(LongType, Seq(us1 * 1000L, us2 * 1000L)),
    "ntz" -> writeEvents(TimestampNTZType, Seq(ntz(us1), ntz(us2))),
    "ltz" -> writeEvents(TimestampType, Seq(ltz(us1), ltz(us2))))

  test("every encoding yields the same stable schema and identical values") {
    encodings.foreach { case (enc, dir) =>
      withClue(enc) {
        val df = Tables(spark, dir, "events")
        df.columns.toSeq shouldBe Seq("event_id", "ts_ns", "user_id",
          "event_type", "value", "props", "ts")
        df.schema("ts_ns").dataType shouldBe LongType
        df.schema("ts").dataType shouldBe TimestampType
        val got = df.orderBy("event_id")
          .select("ts_ns", "ts").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
        // ts_ns is epoch nanos; Timestamp.getTime is epoch millis
        got.toSeq shouldBe Seq((us1 * 1000L, us1 / 1000L),
          (us2 * 1000L, us2 / 1000L))
      }
    }
  }

  test("ranged reads filter correctly on every encoding") {
    encodings.foreach { case (enc, dir) =>
      withClue(enc) {
        Tables.events(spark, dir, from = Some("2024-01-02"))
          .select("event_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
        Tables.events(spark, dir, until = Some("2024-01-02"))
          .select("event_id").collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
        Tables.events(spark, dir, from = Some("2024-01-01"),
          until = Some("2024-01-03"))
          .count() shouldBe 2L
      }
    }
  }

  test("range bounds reach the parquet scan as pushed filters") {
    encodings.foreach { case (enc, dir) =>
      withClue(enc) {
        val p = Tables.events(spark, dir, from = Some("2024-01-02"))
          .queryExecution.executedPlan.toString
        p should include("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,")
      }
    }
  }
}
