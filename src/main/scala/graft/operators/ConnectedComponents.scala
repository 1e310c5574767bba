package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Distributed connected components by hash-min label propagation —
  * the step that turns near-dup PAIRS (d2/d3/d4 output) into dedup
  * DECISIONS: every doc gets the minimum doc id reachable through the
  * near-dup graph as its cluster id, and the cluster id itself is the
  * canonical survivor.
  *
  * Algorithm: each node starts labeled with itself; every round each
  * node takes the min of (its label, its neighbors' labels, its
  * LABEL'S label). The last term is pointer jumping: label chains
  * halve every round, so convergence is O(log diameter) rounds — the
  * same shortcutting idea as the star-contraction algorithms (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
  * not O(diameter) like plain hash-min. Near-dup graphs are unions of
  * small dense cliques (2-3 rounds); a 30-node chain takes ~6. Each
  * round is two shuffle-joins (edges ⋈ labels, labels ⋈ labels) and
  * one min-aggregate, all keyed on node id: no quadratic step
  * anywhere.
  *
  * The per-round driver `count()` reads ONE scalar (the number of
  * changed labels) — iterative control flow, not data collection.
  */
object ConnectedComponents {

  /** edges(srcCol, dstCol) over node ids + the full node set → one row
    * per node: (id, cluster) with cluster = min reachable id.
    * Nodes absent from any edge are singleton clusters of themselves.
    *
    * Every round ends in `localCheckpoint` (materialize + CUT THE
    * LINEAGE): an iterative DataFrame whose plan embeds all previous
    * rounds makes Catalyst re-analyze a plan that doubles per round —
    * wall-clock explodes in the optimizer long before the data is the
    * problem. Checkpointing keeps each round's plan two joins deep
    * (the standard Spark idiom for iterative algorithms). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val short = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.id"))
        .select(col("a.id").as("id"), col("b.label").as("label"))
      val next = labels.select("id", "label").union(prop).union(short)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next.join(labels.select(col("id"), col("label").as("__old")), "id")
        .filter(col("label") < col("__old")).count()
      labels = next
      it += 1
    }
    labels.select(col("id"), col("label").as("cluster"))
  }
}
