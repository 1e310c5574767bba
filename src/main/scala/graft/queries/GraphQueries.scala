package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the order graph — the ranking
  * complement to d6's connected components. The reference's data
  * model has no explicit graph table, so the graph is derived the way
  * a pipeline would derive it: customers and suppliers are nodes,
  * an (undirected) edge connects a customer to every supplier that
  * fulfilled one of its orders (orders ⋈ lineitem, distinct pairs).
  *
  * Determinism contract (the t10 sorted-fold convention): per-node
  * neighbor contributions are folded in source-node order on both
  * engines (`aggregate(array_sort(collect_list(struct(src, c))))` ≡
  * DuckDB `list_sum(list(c ORDER BY src))`), damping constants are
  * cast to DOUBLE explicitly (DuckDB parses bare `0.85` as DECIMAL),
  * and every derived probability is the same sequence of IEEE ops on
  * both sides — bit-identical, not merely close.
  *
  * Scale (100 TB): each PageRank round is one keyed join (edges ⋈
  * ranks on src — shuffle-hash, both sides partitioned by src) plus
  * one partial+final agg keyed by dst; the node-count frame is a
  * 1-row broadcast. Lineage is cut per round (localCheckpoint — the
  * ConnectedComponents lesson: without it the plan doubles per
  * round and Catalyst analysis becomes the bottleneck). The
  * sorted-fold is the oracle-parity artifact; a production run swaps
  * it for a plain `sum` (partial+final, no collect_list) once
  * bit-equality across engines stops being the gate.
  */
object GraphQueries extends QueryPack {

  /** g1 — 3-round damped PageRank (d = 0.85) over the undirected
    * customer↔supplier graph. Node ids are disambiguated by parity
    * (customer k → 2k, supplier k → 2k+1). Undirected ⇒ no dangling
    * nodes (every node has out-degree ≥ 1), so no dangling-mass
    * redistribution term is needed. */
  private def g1(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = pairs
      .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionAll(pairs.select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
    // the edge/degree subtree (fact join + distinct) is STATIC across
    // rounds — persist both or every round recomputes it (measured:
    // 7.8 s → ~2 s at sf0.1). Eager count ends the cache-fill race
    // (the d8/jaccardPairsLeased convention).
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val edgesDeg = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edgesDeg.count()
    val nDf = deg.agg(count(lit(1)).as("n"))

    val sortedFold = expr(
      "aggregate(transform(array_sort(collect_list(struct(src, c))), " +
        "x -> x.c), cast(0.0 AS double), (acc, x) -> acc + x)")

    var ranks = deg.crossJoin(broadcast(nDf))
      .select(col("src").as("node"),
        (lit(1.0).cast("double") / col("n")).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), col("src"),
          (col("r") / col("deg")).as("c"))
      ranks = contrib.groupBy(col("dst"))
        .agg(sortedFold.as("sm"))
        .crossJoin(broadcast(nDf))
        .select(col("dst").as("node"),
          (lit(0.15).cast("double") / col("n") +
            lit(0.85).cast("double") * col("sm")).as("r"))
        .localCheckpoint(true)
    }
    ranks
      .join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node"), (col("node") % 2).as("is_supplier"),
        col("deg"), round(col("r"), 8).as("pagerank"))
      .orderBy(col("node"))
  }

  private val g1Sql = {
    def round(k: Int) =
      s"""r$k AS (
        |  SELECT e.dst AS node,
        |    CAST(0.15 AS DOUBLE) / MAX(n.n) +
        |    CAST(0.85 AS DOUBLE) * list_sum(list(p.r / deg.deg ORDER BY e.src)) AS r
        |  FROM e JOIN r${k - 1} p ON e.src = p.node
        |         JOIN deg ON e.src = deg.src
        |         CROSS JOIN n
        |  GROUP BY e.dst)""".stripMargin
    s"""WITH pe AS (
      |  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |e AS (
      |  SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pe
      |  UNION ALL
      |  SELECT sk * 2 + 1 AS src, ck * 2 AS dst FROM pe),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
      |n AS (SELECT COUNT(*) AS n FROM deg),
      |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / n.n AS r FROM deg, n),
      |${round(1)},
      |${round(2)},
      |${round(3)}
      |SELECT r3.node, r3.node % 2 AS is_supplier, deg.deg,
      |  ROUND(r3.r, 8) AS pagerank
      |FROM r3 JOIN deg ON r3.node = deg.src
      |ORDER BY r3.node""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank" -> g1)

  override def oracle: Map[String, String] = Map(
    "g1_pagerank" -> g1Sql)
}
