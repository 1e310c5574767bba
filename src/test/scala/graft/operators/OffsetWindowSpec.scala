package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[OffsetWindow]] must agree exactly with the naive (funnel-prone)
  * window forms it replaces. */
class OffsetWindowSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (group, value, weight, id)
  private lazy val rows = (1 to 2000).map { i =>
    val g = s"g${i % 3}"
    val x = (i * 2654435761L % 1000).toDouble
    val w = i % 7 + 1
    (g, x, w.toLong, i.toLong)
  }.toDF("g", "x", "w", "id")

  test("prefixSum equals the naive per-group running sum") {
    val naive = rows.withColumn("exp",
      sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("x"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = OffsetWindow.prefixSum(rows, Seq("g"),
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), weight = col("w"), out = "got")
    naive.select("g", "id", "exp")
      .join(got.select("g", "id", "got"), Seq("g", "id"))
      .filter(col("exp") =!= col("got")).count() shouldBe 0L
    got.count() shouldBe 2000L
  }

  test("globalRank equals the naive per-group row_number") {
    val naive = rows.withColumn("exp",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("x"), col("id"))).cast("long"))
    val got = OffsetWindow.globalRank(rows, Seq("g"),
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), out = "got")
    naive.select("g", "id", "exp")
      .join(got.select("g", "id", "got"), Seq("g", "id"))
      .filter(col("exp") =!= col("got")).count() shouldBe 0L
  }

  test("prefixMaxExcl equals the naive exclusive running max") {
    val naive = rows.withColumn("exp",
      max(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("x"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val got = OffsetWindow.prefixMaxExcl(rows, Seq("g"),
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), value = col("w"), out = "got")
    naive.select("g", "id", "exp")
      .join(got.select("g", "id", "got"), Seq("g", "id"))
      .filter(!(col("exp") <=> col("got"))).count() shouldBe 0L
    // per-group first row has no predecessor -> null
    got.filter(col("got").isNull).count() shouldBe
      rows.select("g").distinct().count()
  }

  test("grouped path: the offsets join carries no broadcast hint " +
    "(group cardinality is unbounded)") {
    // with real group columns the per-(group,bucket) offsets frame
    // scales with the group count — a forced broadcast would overflow
    // the driver at high cardinality; the planner must stay free to
    // shuffle (ADVICE r5). The empty-group path still hints broadcast
    // (bucket-count rows only) — asserted by the funnel test below.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def hinted(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
            j.hint.rightHint.exists(_.strategy.isDefined) => j
      }
    hinted(OffsetWindow.prefixSum(rows, Seq("g"),
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), weight = col("w"),
      out = "got")) shouldBe empty
    hinted(OffsetWindow.prefixMaxExcl(rows, Seq("g"),
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), value = col("w"),
      out = "got")) shouldBe empty
  }

  test("empty group list = one global ordering, still gate-clean") {
    val naive = rows.withColumn("exp",
      row_number().over(Window.orderBy(col("x"), col("id"))).cast("long"))
    val got = OffsetWindow.globalRank(rows, Seq.empty,
      bucket = floor(col("x") / 100).cast("long"),
      order = Seq(col("x"), col("id")), out = "got")
    naive.select("id", "exp").join(got.select("id", "got"), Seq("id"))
      .filter(col("exp") =!= col("got")).count() shouldBe 0L
    // no unpartitioned logical Window in the operator's plan (the
    // repo-wide PlanAuditSpec invariant): the offset window runs over
    // the metadata-scale bucket frame with a literal partition key
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val bad = got.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    bad shouldBe empty
  }

  test("hash-bucket shape: bucket as prefix of the order key (the t14 form)") {
    val t = rows.withColumn("h", md5(col("id").cast("string")))
    val naive = t.withColumn("exp",
      sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("h"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = OffsetWindow.prefixSum(t, Seq("g"),
      bucket = substring(col("h"), 1, 2),
      order = Seq(col("h"), col("id")), weight = col("w"), out = "got")
    naive.select("g", "id", "exp")
      .join(got.select("g", "id", "got"), Seq("g", "id"))
      .filter(col("exp") =!= col("got")).count() shouldBe 0L
  }
}
