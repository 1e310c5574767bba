package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SelectionQuantile]] must return exactly the values a full
  * per-group sort would put at the wanted ranks — while touching only
  * the located buckets — and its cumulative-count read must equal the
  * rank it names. */
class SelectionQuantileSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows with DUPLICATE values (ties are
  // where rank selection logic usually breaks): (group, value)
  private lazy val rows = (1 to 3000).map { i =>
    val g = s"g${i % 3}"
    val x = (i * 2654435761L % 500).toDouble // ~6 copies of each value
    (g, x)
  }.toDF("g", "x").withColumn("bk", floor(col("x") / 50).cast("long"))

  private def fullRanks: Map[(String, Long), Double] =
    rows.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("x"))).cast("long"))
      .select("g", "rn", "x").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("valuesAtRanks equals the full-sort values at every wanted rank") {
    val wanted = (n: Long) => Seq(1L, n / 4, n / 2, (n * 95 + 99) / 100, n)
    val (vals, ns) = SelectionQuantile.valuesAtRanks(
      rows, "g", "x", "bk", wanted)
    ns.keySet shouldBe Set("g0", "g1", "g2")
    ns.values.sum shouldBe 3000L
    val truth = fullRanks
    val got = vals.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exactly one row per distinct wanted rank per group, all correct
    got.keySet shouldBe ns.toSeq.flatMap { case (g, n) =>
      wanted(n).distinct.map(g -> _) }.toSet
    got.foreach { case (k, v) => v shouldBe truth(k) }
  }

  test("a caller-fused histogram gives identical results to the self-scan") {
    val wanted = (n: Long) => Seq(n / 3, (n * 2) / 3)
    val hist = rows.groupBy(col("g"), col("bk"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val (a, nsA) = SelectionQuantile.valuesAtRanks(
      rows, "g", "x", "bk", wanted)
    val (b, nsB) = SelectionQuantile.valuesAtRanks(
      rows, "g", "x", "bk", wanted, histOpt = Some(hist))
    nsA shouldBe nsB
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    key(a) shouldBe key(b)
  }

  test("the selection touches only located buckets, never the full table") {
    // with one wanted rank per group, the pass-3 join must keep at
    // most one bucket per group — the whole point of selection
    val wanted = (n: Long) => Seq(n / 2)
    val (vals, ns) = SelectionQuantile.valuesAtRanks(
      rows, "g", "x", "bk", wanted)
    vals.count() shouldBe ns.size.toLong
    // plan shape: the located-bucket and wanted-rank joins broadcast
    val p = vals.queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("an out-of-range wanted rank fails fast instead of silently " +
      "vanishing from the result") {
    val zero = intercept[IllegalArgumentException] {
      SelectionQuantile.valuesAtRanks(rows, "g", "x", "bk", n => Seq(0L))
    }
    zero.getMessage should include("out of [1,")
    val past = intercept[IllegalArgumentException] {
      SelectionQuantile.valuesAtRanks(rows, "g", "x", "bk", n => Seq(n + 1))
    }
    past.getMessage should include("out of [1,")
    // boundary ranks 1 and n are legal
    val (vals, ns) = SelectionQuantile.valuesAtRanks(
      rows, "g", "x", "bk", n => Seq(1L, n))
    vals.count() shouldBe 2L * ns.size
  }

  test("a histogram past the driver cap fails fast and names the " +
      "distributed alternative") {
    // deliberately over-cardinal: every row its own (group, bucket)
    val wide = (1 to 100).map(i => (s"g$i", i.toDouble))
      .toDF("g", "x").withColumn("bk", col("x").cast("long"))
    SelectionQuantile.maxHistRowsOverride = Some(50)
    val cap = try intercept[IllegalArgumentException] {
      SelectionQuantile.valuesAtRanks(wide, "g", "x", "bk", _ => Seq(1L))
    } finally SelectionQuantile.maxHistRowsOverride = None
    cap.getMessage should include("OffsetWindow.prefixSum")
    cap.getMessage should include("SPARK_GRAFT_SELECTION_MAX_HIST")
  }

  test("pickAtFrac over a cumulated count frame equals the named rank") {
    val counts = rows.groupBy(col("g"), col("x"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("x"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    val got = cum.groupBy(col("g"))
      .agg(SelectionQuantile.pickAtFrac(col("x"), col("cum"), col("n"),
          1, 2).as("p50"),
        SelectionQuantile.pickAtFrac(col("x"), col("cum"), col("n"),
          99, 100).as("p99"),
        max(col("n")).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val truth = fullRanks
    got.foreach { case (g, (p50, p99, n)) =>
      p50 shouldBe truth((g, (n + 1) / 2))
      p99 shouldBe truth((g, (n * 99 + 99) / 100))
    }
  }
}
