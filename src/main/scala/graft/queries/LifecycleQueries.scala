package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{CdcApply, Scd2}

/** Dimension-lifecycle queries: the sync/history workflows the
  * reference runs against its dim tables (SURVEY §2.8 K4/K8),
  * hash-gated. The reference clear-and-replaces DimAgent because its
  * sink can't update; [[graft.etl.Scd2]] is the history-keeping
  * upgrade path, and k1 drives its merge through a deterministic
  * two-snapshot roster cycle so the full insert / change / delete /
  * unchanged matrix lands under the driver's DuckDB oracle.
  */
object LifecycleQueries extends QueryPack {

  /** k1 — SCD type-2 merge over two roster snapshots derived from the
    * `customer` table (the roster analog: key + tracked attributes):
    *
    *  - snapshot 1 (effective 2024-01-01): custkey ≤ 1200;
    *  - snapshot 2 (effective 2024-02-01): custkey > 300, with
    *    custkey % 7 = 0 moved to segment 'SEG_MOVED'.
    *
    * So keys 1-300 exercise DELETE (closed, no successor), 301-1200
    * with %7=0 exercise CHANGE (closed + new version), the rest of
    * 301-1200 exercise UNCHANGED (original version survives open),
    * and 1201-1500 exercise INSERT — plus the bootstrap-from-empty
    * path, since snapshot 1 itself lands via [[Scd2.merge]].
    *
    * Scale: both merges are one full-outer join on the business key +
    * a union with closed history (see Scd2's scaladoc) — no windows,
    * no per-key loops. */
  /** The two-snapshot SCD2 table k1 gates — shared with k3's
    * time-travel reads. */
  private def scdTable(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val attrs = Seq("c_name", "c_mktsegment")
    val snap1 = cust.filter(col("c_custkey") <= 1200)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val snap2 = cust.filter(col("c_custkey") > 300)
      .select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 7 === 0, lit("SEG_MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val t1 = to_timestamp(lit("2024-01-01 00:00:00"))
    val t2 = to_timestamp(lit("2024-02-01 00:00:00"))
    val empty = snap1
      .withColumn("validFrom", t1)
      .withColumn("validTo", lit(null).cast("timestamp"))
      .withColumn("isCurrent", lit(true))
      .limit(0)
    val v1 = Scd2.merge(empty, snap1, "c_custkey", attrs, t1)
    Scd2.merge(v1, snap2, "c_custkey", attrs, t2)
  }

  private def k1(s: SparkSession, dir: String): DataFrame = {
    scdTable(s, dir).select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
      col("validFrom").cast("date").as("valid_from"),
      col("validTo").cast("date").as("valid_to"),
      col("isCurrent").as("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  private val k1Sql =
    """WITH s1 AS (
      |  SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey <= 1200),
      |s2 AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'SEG_MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey > 300),
      |j AS (
      |  SELECT o.c_custkey AS ok, o.c_name AS o_name, o.c_mktsegment AS o_seg,
      |         i.c_custkey AS ik, i.c_name AS i_name, i.c_mktsegment AS i_seg
      |  FROM s1 o FULL OUTER JOIN s2 i ON o.c_custkey = i.c_custkey)
      |SELECT * FROM (
      |  SELECT ok AS c_custkey, o_name AS c_name, o_seg AS c_mktsegment,
      |    DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |    TRUE AS is_current
      |  FROM j WHERE ok IS NOT NULL AND ik IS NOT NULL
      |    AND o_name = i_name AND o_seg = i_seg
      |  UNION ALL
      |  SELECT ok, o_name, o_seg, DATE '2024-01-01', DATE '2024-02-01', FALSE
      |  FROM j WHERE ok IS NOT NULL
      |    AND (ik IS NULL OR o_name <> i_name OR o_seg <> i_seg)
      |  UNION ALL
      |  SELECT ik, i_name, i_seg, DATE '2024-02-01', NULL, TRUE
      |  FROM j WHERE ik IS NOT NULL
      |    AND (ok IS NULL OR o_name <> i_name OR o_seg <> i_seg))
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** Three-snapshot SCD2 table for k4 — k1's two merges plus a third
    * (effective 2024-03-01): custkey % 11 = 0 moves to 'SEG_V3'
    * (taking precedence over the % 7 SEG_MOVED rule), everything else
    * unchanged. This builds keys with TWO closed versions (custkey
    * % 77 = 0: moved at t2, moved again at t3), so the retention
    * horizon between t2 and t3 exercises both outcomes — a closed
    * version expired (validTo = t2 < horizon) and a closed version
    * retained (validTo = t3 ≥ horizon). */
  private def scdTable3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val snap3 = cust.filter(col("c_custkey") > 300)
      .select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 11 === 0, lit("SEG_V3"))
          .when(col("c_custkey") % 7 === 0, lit("SEG_MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    Scd2.merge(scdTable(s, dir), snap3, "c_custkey",
      Seq("c_name", "c_mktsegment"),
      to_timestamp(lit("2024-03-01 00:00:00")))
  }

  /** k4 — SCD2 RETENTION vacuum ([[graft.etl.Scd2.vacuum]]): the
    * three-merge history pruned to the 2024-02-15 horizon. Versions
    * with validTo < horizon drop (the deleted keys 1-300's only
    * version, and the first closed version of every % 7 = 0 key);
    * versions closed AT OR AFTER the horizon survive (the t3-closed
    * versions of % 11 = 0 keys), as does every open row — so
    * time travel at any t ≥ horizon is bit-identical to the unpruned
    * table (the retention contract, gated in Round14InvariantsSpec)
    * while the table sheds its expired tail. The oracle rebuilds the
    * full version history independently (change-point runs over the
    * three snapshots) and applies the same horizon filter. */
  private def k4(s: SparkSession, dir: String): DataFrame =
    Scd2.vacuum(scdTable3(s, dir),
      to_timestamp(lit("2024-02-15 00:00:00")))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("validFrom").cast("date").as("valid_from"),
        col("validTo").cast("date").as("valid_to"),
        col("isCurrent").as("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))

  private val k4Sql =
    """WITH s1 AS (
      |  SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey <= 1200),
      |s2 AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'SEG_MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey > 300),
      |s3 AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'SEG_V3'
      |         WHEN c_custkey % 7 = 0 THEN 'SEG_MOVED'
      |         ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey > 300),
      |tl AS (
      |  SELECT c_custkey, c_name, c_mktsegment, 1 AS gen,
      |    TIMESTAMP '2024-01-01' AS vf FROM s1
      |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 2,
      |    TIMESTAMP '2024-02-01' FROM s2
      |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 3,
      |    TIMESTAMP '2024-03-01' FROM s3),
      |m AS (
      |  SELECT *,
      |    LAG(c_name) OVER w AS pname,
      |    LAG(c_mktsegment) OVER w AS pseg,
      |    LAG(gen) OVER w AS pgen
      |  FROM tl WINDOW w AS (PARTITION BY c_custkey ORDER BY gen)),
      |starts AS (
      |  SELECT c_custkey, c_name, c_mktsegment, gen, vf FROM m
      |  WHERE pgen IS NULL OR pname <> c_name OR pseg <> c_mktsegment),
      |ends AS (
      |  SELECT *,
      |    LEAD(vf) OVER (PARTITION BY c_custkey ORDER BY gen) AS next_vf
      |  FROM starts),
      |fin AS (
      |  -- a version closes at the next version's start, or — for the
      |  -- keys deleted from snapshot 2 (c_custkey <= 300, present in
      |  -- s1 only) — at that snapshot's effective instant
      |  SELECT c_custkey, c_name, c_mktsegment, vf,
      |    CASE WHEN next_vf IS NOT NULL THEN next_vf
      |         WHEN c_custkey <= 300 THEN TIMESTAMP '2024-02-01'
      |         ELSE NULL END AS vt
      |  FROM ends)
      |SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(vf AS DATE) AS valid_from, CAST(vt AS DATE) AS valid_to,
      |  (vt IS NULL) AS is_current
      |FROM fin
      |WHERE vt IS NULL OR vt >= TIMESTAMP '2024-02-15'
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** k2 — CDC apply ([[graft.etl.CdcApply]], the live-table MERGE
    * beside k1's history-keeping SCD2): the events stream becomes a
    * change log over per-user profiles — every event upserts the
    * user's latest (amount, day), `error` events are tombstones —
    * applied in two batches (bootstrap-from-empty, then week 2+).
    * Last-writer-wins composes across batches, so the oracle is one
    * window over the whole log: the final state depends only on each
    * key's LAST change, which is exactly what makes CDC apply safe to
    * run incrementally at any cadence.
    *
    * Scale: see CdcApply — per-batch partial+final max-struct agg +
    * one keyed full-outer join; no windows, no broadcast. */
  private def k2(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .filter(col("ts_ns") < Tables.nanos("2024-02-01"))
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("value").as("amt"),
        date_trunc("DAY", col("ts")).cast("date").as("day"))
    val cut = Tables.nanos("2024-01-15")
    val empty = e.select(col("user_id"), col("amt"), col("day")).limit(0)
    val snap1 = CdcApply(empty, e.filter(col("ts_ns") < cut),
      "user_id", Seq("ts_ns", "event_id"), "op", Seq("amt", "day"))
    CdcApply(snap1, e.filter(col("ts_ns") >= cut),
      "user_id", Seq("ts_ns", "event_id"), "op", Seq("amt", "day"))
      .orderBy(col("user_id"))
  }

  private val k2Sql =
    """WITH ch AS (
      |  SELECT user_id, epoch_ns(ts) AS v, event_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    value AS amt, CAST(ts AS DATE) AS day
      |  FROM events WHERE ts < TIMESTAMP '2024-02-01'),
      |last AS (
      |  SELECT user_id, op, amt, day FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY v DESC, event_id DESC) AS rn FROM ch) t
      |  WHERE rn = 1)
      |SELECT user_id, amt, day FROM last WHERE op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** k3 — time travel over the SCD2 dim: the same history table k1
    * gates, read "as of" three instants — before the second merge,
    * after it, and mid-history on the exact merge boundary (validFrom
    * inclusive, validTo exclusive — the boundary row must belong to
    * the NEW version). Emits per (as_of, segment) member counts and a
    * key checksum, so segment membership drift across versions
    * (SEG_MOVED exists only at t2; keys 1-300 exist only at t1) is
    * hash-gated. This is the read side of SCD2: the fact-join form is
    * [[graft.etl.Scd2.asOfJoin]] (gated by e9/e10's as-of machinery);
    * here the snapshot selector itself is under the oracle.
    *
    * Scale: the snapshot filter is a predicate on the dim (partition
    * the closed history by validTo year and time travel prunes to
    * the open slice + one year); counts are one hash agg. */
  private def k3(s: SparkSession, dir: String): DataFrame = {
    val scd = scdTable(s, dir)
    def snap(at: String): DataFrame = {
      val t = to_timestamp(lit(at))
      scd.filter(col("validFrom") <= t &&
          (col("validTo").isNull || col("validTo") > t))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("c_custkey")).as("key_sum"))
        .select(lit(at).as("as_of"), col("c_mktsegment"),
          col("n_members"), col("key_sum"))
    }
    snap("2024-01-15 00:00:00")
      .unionByName(snap("2024-02-01 00:00:00")) // boundary: new version wins
      .unionByName(snap("2024-02-15 00:00:00"))
      .orderBy(col("as_of"), col("c_mktsegment"))
  }

  /** Oracle: rebuild the version table (k1's CTE) and filter each
    * interval per timestamp. */
  private val k3Sql =
    """WITH s1 AS (
      |  SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey <= 1200),
      |s2 AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'SEG_MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey > 300),
      |j AS (
      |  SELECT o.c_custkey AS ok, o.c_name AS o_name, o.c_mktsegment AS o_seg,
      |         i.c_custkey AS ik, i.c_name AS i_name, i.c_mktsegment AS i_seg
      |  FROM s1 o FULL OUTER JOIN s2 i ON o.c_custkey = i.c_custkey),
      |scd AS (
      |  SELECT ok AS c_custkey, o_seg AS c_mktsegment,
      |    TIMESTAMP '2024-01-01' AS vf, CAST(NULL AS TIMESTAMP) AS vt
      |  FROM j WHERE ok IS NOT NULL AND ik IS NOT NULL
      |    AND o_name = i_name AND o_seg = i_seg
      |  UNION ALL
      |  SELECT ok, o_seg, TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01'
      |  FROM j WHERE ok IS NOT NULL
      |    AND (ik IS NULL OR o_name <> i_name OR o_seg <> i_seg)
      |  UNION ALL
      |  SELECT ik, i_seg, TIMESTAMP '2024-02-01', NULL
      |  FROM j WHERE ik IS NOT NULL
      |    AND (ok IS NULL OR o_name <> i_name OR o_seg <> i_seg)),
      |ats AS (SELECT * FROM (VALUES
      |  (TIMESTAMP '2024-01-15'), (TIMESTAMP '2024-02-01'),
      |  (TIMESTAMP '2024-02-15')) v(t))
      |SELECT strftime(ats.t, '%Y-%m-%d %H:%M:%S') AS as_of, c_mktsegment,
      |  COUNT(*) AS n_members, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      |FROM scd, ats WHERE vf <= ats.t AND (vt IS NULL OR vt > ats.t)
      |GROUP BY 1, 2 ORDER BY as_of, c_mktsegment""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k4_retention"  -> k4,
    "k3_time_travel" -> k3,
    "k1_scd2_merge" -> k1,
    "k2_cdc_apply"  -> k2)

  override def oracle: Map[String, String] = Map(
    "k4_retention"  -> k4Sql,
    "k3_time_travel" -> k3Sql,
    "k1_scd2_merge" -> k1Sql,
    "k2_cdc_apply"  -> k2Sql)

  /** Spec hooks for the retention contract
    * (Round14InvariantsSpec). */
  private[graft] def scd3ForSpec(s: SparkSession, dir: String): DataFrame =
    scdTable3(s, dir)
  private[graft] def vacuumHorizon: String = "2024-02-15 00:00:00"
}
