package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: advance a keyed snapshot by a change
  * log of upserts and deletes — the batch equivalent of a lakehouse
  * MERGE INTO, and the complement of [[Scd2]] (Scd2 keeps history;
  * CdcApply produces the LIVE table a downstream join actually
  * reads).
  *
  * Semantics: per key, the change with the highest version wins
  * (last-writer-wins). A winning upsert inserts or overwrites the
  * key's row; a winning delete removes the key (a tombstone for an
  * absent key is a no-op). Snapshot keys without changes pass
  * through untouched.
  *
  * Scale: the log collapses to one row per key with a partial+final
  * `max(struct(version…, payload…))` aggregation — map-side combine
  * absorbs per-key change bursts BEFORE the shuffle, which a
  * `row_number` window (sorting every change on the reduce side)
  * would not; then one full-outer join on the key against the
  * snapshot. Nothing broadcasts, nothing funnels: both sides
  * partition by the key.
  */
object CdcApply {

  /** `versionCols` orders changes within a key (must be unique per
    * key — e.g. event time + a tiebreaking id); `opCol` holds "U"
    * (upsert) or "D" (delete); `payload` are the carried columns. */
  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
      versionCols: Seq[String], opCol: String,
      payload: Seq[String]): DataFrame = {
    val ordered: Seq[Column] = (versionCols ++ (opCol +: payload)).map(col)
    val latest = changes
      .groupBy(col(key))
      .agg(max(struct(ordered: _*)).as("__ch"))
      .select(col(key) +: col(s"__ch.$opCol").as("__op") +:
        payload.map(p => col(s"__ch.$p").as(s"__c_$p")): _*)
    snapshot
      .join(latest, Seq(key), "full_outer")
      // a winning delete removes the key; everything else survives
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: payload.map(p =>
        coalesce(col(s"__c_$p"), col(p)).as(p)): _*)
  }
}
