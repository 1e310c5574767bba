package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The analytical layer the reference delegates to Power BI DAX
  * (SURVEY §2.5 A3-A5): per-(agent, metric, day) counts joined to the
  * star dims, %-of-goal, shift-pace ratio, GREEN/YELLOW/RED bucket.
  *
  * Scale: the only fact-side shuffle is the groupBy; all dims
  * broadcast. `asOf` is an injectable clock column (e.g.
  * `lit(ts)`) so results are deterministic and the measure is
  * recomputable for any point in time.
  */
object Scoreboard {

  /** A3 — FactDailyMetric rollup. */
  def dailyCounts(facts: DataFrame): DataFrame =
    facts.groupBy(col("agentId"), col("metricId"), col("factDateKey"))
      .agg(count(lit(1)).as("n_events"))

  /** A4+A5 — goal %, shift pace and color for one business day.
    *
    * @param asOf evaluation instant (local, same clock as DimShift's
    *             ShiftStart/EndLocal)
    */
  def scoreboard(
      facts: DataFrame, dimMetric: DataFrame, dimShift: DataFrame,
      asOf: Column): DataFrame = {
    val counts = dailyCounts(facts)
    val withGoal = counts
      .join(broadcast(dimMetric.select(col("MetricID").as("metricId"),
        col("DefaultGoal"), col("DefaultYellowFloorPct"))), Seq("metricId"))
    val withShift = withGoal.join(
      broadcast(dimShift.select(col("AgentID").as("agentId"),
        col("LocalDate").cast("date").as("factDateKey"),
        col("ShiftStartLocal"), col("ShiftEndLocal"))),
      Seq("agentId", "factDateKey"), "left")
    val pctGoal = when(col("DefaultGoal") > 0,
      col("n_events").cast("double") / col("DefaultGoal")).otherwise(lit(null))
    val shiftElapsed = when(col("ShiftStartLocal").isNotNull,
      least(greatest(
        (unix_timestamp(asOf) - unix_timestamp(col("ShiftStartLocal"))).cast("double") /
          (unix_timestamp(col("ShiftEndLocal")) - unix_timestamp(col("ShiftStartLocal"))),
        lit(0.0)), lit(1.0)))
    withShift
      .withColumn("pct_goal", pctGoal)
      .withColumn("shift_elapsed", shiftElapsed)
      .withColumn("color", color(col("pct_goal"), col("shift_elapsed"),
        col("DefaultYellowFloorPct")))
      .select(col("agentId"), col("metricId"), col("factDateKey"),
        col("n_events"), col("pct_goal"), col("shift_elapsed"), col("color"))
  }

  /** A5 — color bucketing vs pace: at/ahead of pace → GREEN, within
    * the yellow floor of pace → YELLOW, else RED
    * (`docs/quill_dashboard_schema_design_doc.md:150-162`). Without a
    * shift (no pace), compare to the whole-day goal. */
  def color(pctGoal: Column, shiftElapsed: Column, yellowFloor: Column): Column = {
    val pace = coalesce(shiftElapsed, lit(1.0))
    when(pctGoal.isNull, lit(null).cast("string"))
      .when(pctGoal >= pace, "GREEN")
      .when(pctGoal >= pace * yellowFloor, "YELLOW")
      .otherwise("RED")
  }
}
