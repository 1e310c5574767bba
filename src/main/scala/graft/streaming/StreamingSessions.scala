package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the streaming sibling of batch e6:
  * Spark's native `session_window` merges events per key into
  * variable-length windows that close after `gap` of event-time
  * silence; the watermark both bounds state (open sessions only) and
  * decides when a session is final, so append mode emits each session
  * exactly once, complete.
  *
  * Scale: state is one open window per active key, merged by the
  * session-window operator itself (no custom state code); keys shard
  * across executors. This is what "user session analytics over a
  * firehose" should compile to — no flatMapGroupsWithState needed
  * unless per-event custom logic appears.
  */
object StreamingSessions {

  /** events(keyCol, tsCol: timestamp) stream → one row per CLOSED
    * session: key, session start/end, event count. `lateness` should
    * come from the e33 lateness audit via
    * [[WatermarkCalibration.calibrate]] (the documented default
    * composition), not a hand-picked guess — see
    * WatermarkCalibrationSpec for the kept-vs-dropped proof. */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String,
      gap: String = "30 minutes", lateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
