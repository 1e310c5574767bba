package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("g1", 0.9, 1L), ("g1", 0.5, 2L), ("g1", 0.9, 3L), ("g1", 0.7, 4L),
    ("g2", 0.1, 5L)
  ).toDF("g", "score", "id")

  test("keeps k best with deterministic (score desc, id asc) order") {
    val topk = udaf(new TopKAgg(2))
    val out = df.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .select($"g", $"top").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    out("g1") shouldBe Seq((0.9, 1L), (0.9, 3L)) // tie → lower id first
    out("g2") shouldBe Seq((0.1, 5L))
  }

  test("merge of partial buffers equals global order (partition-independent)") {
    val topk = udaf(new TopKAgg(3))
    val big = (1 to 500).map(i => ("g", (i % 97) / 96.0, i.toLong))
      .toDF("g", "score", "id").repartition(13)
    val got = big.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .select(explode($"top")).select("col.score", "col.id")
      .as[(Double, Long)].collect().toSeq
    val want = (1 to 500).map(i => ((i % 97) / 96.0, i.toLong))
      .sortBy { case (s, id) => (-s, id) }.take(3)
    got shouldBe want
  }
}
