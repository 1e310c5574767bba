package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DELETE-BY-KEY retention (right-to-be-forgotten) — the cascade a
  * training-data pipeline owes every keyed deletion request. Time-
  * based retention (K4 vacuum / [[Maintenance]]) reclaims old rows;
  * a forget request instead names a DOC SET and requires the set AND
  * ITS DERIVATIVES gone: the raw docs, their signature-index rows,
  * and the near-dup cluster labels they participated in.
  *
  * Rows delete by anti-join; labels need RETRACTION — removing a
  * node can split a component (bridge doc) or relabel it (the
  * cluster's min-id rep forgotten), so the label table cannot be
  * repaired row-locally. The q37 retract-IVM identity applies: only
  * components that LOST a member can change, so recomputation is
  * semi-join-pruned to exactly those components' surviving members
  * and their surviving pair evidence — forget-batch-sized work, never
  * an index-sized CC rerun. Post-forget artifacts are written as NEW
  * durable tables (the snapshot lifecycle: consumers switch, then the
  * pre-forget snapshot retires through [[Maintenance.run]]'s
  * artifact-drop hook), never mutated in place.
  *
  * STREAMING edge: the admission loop's seeded LSH probe holds
  * signatures of everything seen — forgetting must also UN-SEE, or
  * near-dups of a deleted doc stay suppressed by its ghost. The
  * contract is reseed-on-switch: when consumers move to the
  * post-forget snapshot, the probe restarts seeded from the
  * post-forget signature universe (ForgetSpec's un-see gate drives
  * both sides of the redelivery).
  */
object Forget {

  /** Post-deletion cluster labels via component-pruned retraction.
    *
    * @param labels the CURRENT label view `(doc_id, cluster)` —
    *               cluster = min reachable doc id (the CC convention)
    * @param edges  the pair evidence `(d1, d2)` over the label view's
    *               universe (the cached signature-index pairs; edges
    *               touching forgotten docs are dropped here)
    * @param forget the keyed doc set to delete, `(doc_id)`
    * @return `(doc_id, cluster)` over universe ∖ forget, equal to a
    *         full CC rebuild on the induced surviving subgraph:
    *         components with no forgotten member keep their rows
    *         VERBATIM (membership and min id unchanged), affected
    *         components re-run CC on their surviving members only.
    */
  def retractLabels(labels: DataFrame, edges: DataFrame,
      forget: DataFrame): DataFrame = {
    val f = forget.select(col("doc_id"))
    val affected = labels.join(f, Seq("doc_id"), "left_semi")
      .select(col("cluster")).distinct()
    val untouched = labels
      .join(broadcast(affected), Seq("cluster"), "left_anti")
      .select(col("doc_id"), col("cluster"))
    val members = labels.join(broadcast(affected), Seq("cluster"))
      .join(f, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    // the original CC already proved no edge crosses a component
    // boundary, so restricting both endpoints to affected-component
    // survivors is exactly the induced subgraph that can change
    val subEdges = edges
      .join(members.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_semi")
      .join(members.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_semi")
      .select(col("d1"), col("d2"))
    graft.operators.ConnectedComponents
      .run(subEdges, "d1", "d2", members, "doc_id")
      .select(col("id").as("doc_id"), col("cluster"))
      .unionByName(untouched)
  }
}
