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
  * changed labels) — iterative control flow, not data collection —
  * and by default runs only every `convergeEvery` rounds: at corpus
  * scale the convergence probe is itself a full pass over the label
  * table, so probing every other round halves the control-flow jobs
  * at the cost of at most one extra (cheap, already-converged)
  * propagation round.
  */
object ConnectedComponents {

  /** Labels plus how many propagation rounds ran — exposed so callers
    * (and the cadence spec) can see the iteration count. */
  final case class Stats(labels: DataFrame, rounds: Int)

  /** edges(srcCol, dstCol) over node ids + the full node set → one row
    * per node: (id, cluster) with cluster = min reachable id.
    * Nodes absent from any edge are singleton clusters of themselves. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String, maxIter: Int = 20): DataFrame =
    runWithStats(edges, srcCol, dstCol, nodes, idCol, maxIter).labels

  /** Full-control form.
    *
    * Every round ends in a checkpoint (materialize + CUT THE
    * LINEAGE): an iterative DataFrame whose plan embeds all previous
    * rounds makes Catalyst re-analyze a plan that doubles per round —
    * wall-clock explodes in the optimizer long before the data is the
    * problem (the standard Spark idiom for iterative algorithms).
    *
    * @param checkpointDir when set, rounds cut lineage with RELIABLE
    *        `df.checkpoint()` into this directory (replayable: an
    *        executor loss mid-loop recomputes from storage — the
    *        cluster-scale choice). When None, `localCheckpoint()`:
    *        faster, but blocks live in executor memory and are NOT
    *        replayable — an executor loss kills the job. Fine for
    *        single-JVM runs; set the dir on a real cluster.
    * @param convergeEvery probe for convergence every N rounds
    *        (default 2 — see the class doc; 1 restores probe-every-
    *        round). Termination stays exact: the probe compares
    *        labels across the LAST round, and a converged round is
    *        idempotent, so skipped probes never change the fixpoint,
    *        only when it is observed. */
  def runWithStats(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String, maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      convergeEvery: Int = 2): Stats = {
    require(convergeEvery >= 1, "convergeEvery must be >= 1")
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    val sym = cut(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
    // Rounds run over EDGE-TOUCHED nodes only: a node with no edge
    // can never receive a foreign label, so it is a singleton of
    // itself by construction and re-joining it through every round
    // is pure waste. On dedup graphs the touched set is the near-dup
    // minority — corpus-sized label tables shrink to pair-touched
    // size in every per-round join/agg/checkpoint (at 100 TB this is
    // the difference between rounds over the corpus and rounds over
    // the duplicates). Untouched nodes rejoin as self-labeled
    // singletons in the final projection below — exact, not an
    // approximation (sym is symmetric, so every endpoint appears as
    // src and no propagation path is lost).
    var labels = cut(sym.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id")))
    var converged = false
    var it = 0
    // r18 notes — two variants MEASURED and REJECTED (interleaved
    // same-session A/B over c1/m4/d20, results identical both arms):
    //  1. probe-free rounds (carry the previous label as an __old
    //     column through the round aggregate; convergence = a scan):
    //     SLOWER (c1 +0.41 s, m4 +0.24 s of ~2 s) — the carry taxes
    //     every round's 3-way union + aggregate while this probe join
    //     runs only every convergeEvery rounds over checkpointed
    //     (broadcast-sized) label tables.
    //  2. round-1 algebraic specialization (label==id initially, so
    //     prop reduces to a projection of sym and the pointer-jump is
    //     a no-op — round 1 join-free, identity init elided): ALSO
    //     slower (c1 +0.26 s, m4 +0.19 s; d20 flat) — AQE broadcasts
    //     the tiny label table anyway, so the removed joins cost
    //     ~nothing, while the specialized round feeds the aggregate
    //     two full sym projections.
    // The uniform-round shape below is the measured optimum.
    while (!converged && it < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("label"))
      val short = labels.as("a")
        .join(labels.as("b"), col("a.label") === col("b.id"))
        .select(col("a.id").as("id"), col("b.label").as("label"))
      val next = cut(labels.select("id", "label").union(prop).union(short)
        .groupBy("id").agg(min("label").as("label")))
      it += 1
      // no probe on the final maxIter round — the loop exits either way
      if (it % convergeEvery == 0 && it < maxIter) {
        val changed = next
          .join(labels.select(col("id"), col("label").as("__old")), "id")
          .filter(col("label") < col("__old")).count()
        converged = changed == 0
      }
      labels = next
    }
    val full = nodes.select(col(idCol).as("id")).distinct()
      .join(labels.select(col("id"), col("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"))
    Stats(full, it)
  }
}
