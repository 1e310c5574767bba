package graft.etl

import java.sql.{Date, Timestamp}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec

object RecordingPusher extends PushSink.RowPusher {
  val chunks = new ConcurrentLinkedQueue[(String, Seq[String])]()
  override def push(table: String, chunk: Seq[String]): Unit =
    chunks.add(table -> chunk)
}

class PushSinkSpec extends SparkSpec {
  import spark.implicits._

  private def facts(n: Int) =
    (1 to n).map(i => (s"E:$i", s"a${i % 3}", Date.valueOf("2024-01-02"),
      "CALLS", if (i % 2 == 0) null else s"note$i", "ALOWARE",
      Timestamp.valueOf("2024-01-02 12:00:00"), s"K:$i"))
      .toDF("eventId", "agentId", "factDateKey", "metricId", "notes",
        "source", "receivedAt", "dedupKey")

  test("P8 rename + null-notes default") {
    val sink = PushSink.toSinkColumns(facts(2))
    sink.columns.toSeq shouldBe Seq("EventID", "AgentID", "FactDateKey", "MetricID", "Notes")
    val r = sink.orderBy("EventID").collect()
    r(0).getAs[String]("FactDateKey") shouldBe "2024-01-02"
    r(1).getAs[String]("Notes") shouldBe "" // null → ""
  }

  test("pushBatch chunks rows executor-side and pushes every row once") {
    RecordingPusher.chunks.clear()
    val pushed = PushSink.pushBatch(facts(57), RecordingPusher, chunkSize = 10)
    pushed shouldBe 57
    val all = scala.jdk.CollectionConverters.CollectionHasAsScala(
      RecordingPusher.chunks).asScala.toSeq
    all.foreach { case (table, chunk) =>
      table shouldBe "FactEvent"
      chunk.size should be <= 10
    }
    val ids = all.flatMap(_._2).map { j =>
      j should include("\"EventID\"")
      j.split("\"EventID\":\"")(1).split("\"")(0)
    }
    ids.sorted shouldBe (1 to 57).map(i => s"E:$i").sorted
  }

  test("K5 createStarTables is idempotent and queryable") {
    Dims.createStarTables(spark)
    Dims.createStarTables(spark) // IF NOT EXISTS
    spark.table("FactEvent").columns.toSeq shouldBe
      Seq("EventID", "AgentID", "FactDateKey", "MetricID", "Notes")
    spark.table("DimShift").count() shouldBe 0
  }
}
