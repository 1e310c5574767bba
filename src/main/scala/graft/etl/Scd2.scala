package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — history-keeping dim sync,
  * the upgrade path from [[DimAgentSync]]'s clear-and-replace (which
  * the reference does because Power BI push datasets can't update):
  * every key keeps a row per VERSION with [validFrom, validTo) bounds
  * and an isCurrent flag, so facts join "as of" their date instead of
  * against whatever the dim looked like at load time.
  *
  * Merge semantics per key, given `current` (the dim table) and
  * `incoming` (today's roster snapshot, one row per key):
  *  - new key → insert (validFrom = asOf, validTo = null, current);
  *  - attribute change → close the open row (validTo = asOf) and
  *    insert the new version;
  *  - unchanged → untouched;
  *  - key absent from the snapshot → close the open row (a delete is
  *    just a change with no successor).
  *
  * Scale: one full-outer join of open rows vs snapshot on the key +
  * a union with closed history — no windows, no per-key loops; closed
  * history is write-once (partition it by validTo year and the merge
  * only rewrites the open slice).
  */
object Scd2 {

  /** @param current  existing SCD2 table (key, attrs..., validFrom,
    *                 validTo, isCurrent) — pass an empty DataFrame
    *                 with the right schema to bootstrap
    * @param incoming snapshot (key, attrs...), one row per key
    * @param keyCol   business key column name
    * @param attrs    tracked attribute column names (a change in any
    *                 opens a new version)
    * @param asOf     the snapshot's effective timestamp column/lit */
  def merge(current: DataFrame, incoming: DataFrame, keyCol: String,
      attrs: Seq[String], asOf: Column): DataFrame = {
    val closed = current.filter(!col("isCurrent"))
    val open = current.filter(col("isCurrent"))
    val attrsChanged: Column = attrs.map { a =>
      // null-safe inequality: a change to/from null is a change
      !(col(s"o.$a") <=> col(s"i.$a"))
    }.reduce(_ || _)

    val j = open.as("o").join(incoming.as("i"),
      col(s"o.$keyCol") === col(s"i.$keyCol"), "full_outer")
    val keyAbsent = col(s"i.$keyCol").isNull   // deleted from snapshot
    val keyNew = col(s"o.$keyCol").isNull      // first sighting

    // surviving open rows: unchanged keys keep their version
    val untouched = j.filter(!keyNew && !keyAbsent && !attrsChanged)
      .select(open.columns.map(c => col(s"o.$c")).toIndexedSeq: _*)
    // closed this merge: changed or deleted keys get validTo = asOf
    val closedNow = j.filter(!keyNew && (keyAbsent || attrsChanged))
      .select(open.columns.map(c => col(s"o.$c")).toIndexedSeq: _*)
      .withColumn("validTo", asOf)
      .withColumn("isCurrent", lit(false))
    // opened this merge: changed + brand-new keys start a version
    val openedNow = j.filter(keyNew || (!keyAbsent && attrsChanged))
      .select((keyCol +: attrs).map(c => col(s"i.$c")).toIndexedSeq: _*)
      .withColumn("validFrom", asOf)
      .withColumn("validTo", lit(null).cast("timestamp"))
      .withColumn("isCurrent", lit(true))

    closed.unionByName(untouched).unionByName(closedNow)
      .unionByName(openedNow)
  }

  /** RETENTION vacuum — the maintenance job the SCD2 lifecycle was
    * missing: history grows one closed row per change forever, and a
    * production dim prunes versions older than its time-travel
    * retention window (the Delta/Iceberg VACUUM + RETAIN shape).
    *
    * Rule: drop exactly the versions with `validTo < horizon`. This
    * preserves EVERY as-of read at `t >= horizon` bit-for-bit — a
    * version alive at such a `t` has `validTo > t >= horizon` (or
    * null) and is never dropped — while reads before the horizon are
    * explicitly forfeited (they may now return fewer/no rows; that is
    * the retention contract, spec-gated in Round14InvariantsSpec).
    *
    * Scale: a pure partition-prunable filter — with closed history
    * partitioned by validTo year (the merge scaladoc's layout), the
    * vacuum rewrites only expired partitions and never touches the
    * open slice. */
  def vacuum(scd: DataFrame, horizon: Column): DataFrame =
    scd.filter(col("validTo").isNull || col("validTo") >= horizon)

  /** The as-of dim lookup SCD2 exists for: the version whose
    * [validFrom, validTo) interval contains `at`. */
  def asOfJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      at: Column): DataFrame =
    facts.join(dim,
      facts(keyCol) === dim(keyCol) &&
        at >= dim("validFrom") &&
        (dim("validTo").isNull || at < dim("validTo")),
      "left")
      .drop(dim(keyCol))
}
