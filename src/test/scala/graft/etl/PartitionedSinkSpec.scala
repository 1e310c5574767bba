package graft.etl

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Facts at scale are written partitioned by business date, so the
  * dashboard's calendar filters (TimeFilters) become partition
  * pruning — the scan touches only the requested days. */
class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned fact sink prunes partitions under a calendar filter") {
    val out = Files.createTempDirectory("graft-facts").toString
    val facts = (1 to 300).map { i =>
      val day = Date.valueOf(f"2024-01-${i % 10 + 1}%02d")
      (s"E:$i", s"a${i % 5}", day, "CALLS", "", "ALOWARE",
        Timestamp.valueOf("2024-01-15 00:00:00"), s"K:$i")
    }.toDF("eventId", "agentId", "factDateKey", "metricId", "notes",
      "source", "receivedAt", "dedupKey")
    facts.write.partitionBy("factDateKey").mode("overwrite").parquet(out)

    // layout: one directory per day
    new java.io.File(out).listFiles().count(_.getName.startsWith("factDateKey=")) shouldBe 10

    val read = spark.read.parquet(out)
    val filtered = read.filter(
      TimeFilters.custom($"factDateKey", java.time.LocalDate.of(2024, 1, 3),
        java.time.LocalDate.of(2024, 1, 4)))
    filtered.count() shouldBe 60
    val scan = filtered.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    // pruning proof: only 2 of 10 partition dirs are read
    val files = filtered.select(input_file_name()).distinct().as[String].collect()
    files.foreach { f =>
      (f.contains("factDateKey=2024-01-03") ||
        f.contains("factDateKey=2024-01-04")) shouldBe true
    }
  }
}
