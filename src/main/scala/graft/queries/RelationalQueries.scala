package graft.queries

import graft.{QueryPack, Tables}
import graft.QueryPack.{dec, money}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational coverage on the TPC-H-ish tables: scan+filter+agg,
  * star joins, top-k, semi/anti joins, windows, set ops, rollup.
  *
  * These are the analytical operators the reference delegates to Power
  * BI DAX (SURVEY.md §2.5 A3-A5, §2.6 joins, §2.7 sorts/set-ops) —
  * here they are first-class, Catalyst-optimized plans.
  *
  * Scale notes (100 TB): every query is a declarative plan — filters
  * and projections reach the parquet scan; dimension joins (nation,
  * region, supplier) are broadcast-hash; the only shuffles are the
  * final keyed aggregations, which run partial (map-side) first.
  */
object RelationalQueries extends QueryPack {

  /** TPC-H Q1-style pricing summary: the canonical partial-agg shape.
    * Exercises scan → filter (pushed) → hash agg (partial+final).
    */
  private def q1(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
        money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star join: fact (lineitem) → orders → customer → nation → region
    * with a region filter; revenue per nation. nation/region/customer
    * are broadcast; only the fact side shuffles (for the final agg).
    */
  private def q2(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o  = Tables(s, dir, "orders")
    val c  = Tables(s, dir, "customer")
    val n  = Tables(s, dir, "nation")
    val r  = Tables(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(money(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val q2Sql =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k: 10 highest-revenue open orders (TPC-H Q3 shape). Ordering
    * on the exact decimal sum keeps the cut deterministic; TakeOrdered
    * avoids a global sort at scale.
    */
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o  = Tables(s, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_date"),
        money(col("rev_dec")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
  }

  private val q3Sql =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT o_orderkey, o_orderdate,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY o_orderkey, o_orderdate
      |  ORDER BY rev_dec DESC, o_orderkey
      |  LIMIT 10
      |) t
      |ORDER BY revenue DESC, o_orderkey""".stripMargin

  /** Left-semi join (EXISTS): the reference's roster allow-list gate
    * shape (SURVEY §2.3 F3 / §2.6) on relational data.
    */
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o  = Tables(s, dir, "orders")
    o.join(li.filter(col("l_quantity") > 45).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): the reference's cross-request ledger
    * dedup shape for batch replay (SURVEY §2.4 D2).
    */
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val recent = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q5Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Highly selective filter + single-value agg (TPC-H Q6 shape): the
    * filter-early optimization the reference hand-codes (SURVEY §4).
    * All three predicates push to the parquet scan.
    */
  private def q6(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(money(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  private val q6Sql =
    """SELECT
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Window / top-N-per-group: first-wins semantics of the reference's
    * within-batch dedup (SURVEY §2.4 D1) generalized to rank-per-key.
    */
  private def q7(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  private val q7Sql =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Set ops: UNION / INTERSECT / EXCEPT over nation keys reachable
    * from customers vs suppliers (SURVEY §2.7 O2 union-of-sources).
    */
  private def q8(s: SparkSession, dir: String): DataFrame = {
    val cNk = Tables(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
    val sNk = Tables(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
    val n   = Tables(s, dir, "nation")
    val tagged = cNk.union(sNk).distinct().withColumn("tag", lit("any"))
      .unionByName(cNk.intersect(sNk).withColumn("tag", lit("both")))
      .unionByName(cNk.except(sNk).withColumn("tag", lit("cust_only")))
    tagged.join(broadcast(n), col("k") === col("n_nationkey"))
      .select(col("tag"), col("n_name"))
      .orderBy(col("tag"), col("n_name"))
  }

  private val q8Sql =
    """WITH c AS (SELECT DISTINCT c_nationkey AS k FROM customer),
      |     s AS (SELECT DISTINCT s_nationkey AS k FROM supplier),
      |     tagged AS (
      |       SELECT k, 'any' AS tag FROM (SELECT k FROM c UNION SELECT k FROM s)
      |       UNION ALL
      |       SELECT k, 'both' AS tag FROM (SELECT k FROM c INTERSECT SELECT k FROM s)
      |       UNION ALL
      |       SELECT k, 'cust_only' AS tag FROM (SELECT k FROM c EXCEPT SELECT k FROM s))
      |SELECT tag, n_name
      |FROM tagged JOIN nation ON k = n_nationkey
      |ORDER BY tag, n_name""".stripMargin

  /** Rollup: hierarchical region → nation customer counts with
    * subtotals (grouping-set aggregation).
    */
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           money(sum(dec(col("c_acctbal")))).as("sum_acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  private val q9Sql =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1,
    "q2_star_join"       -> q2,
    "q3_topk_revenue"    -> q3,
    "q4_semi_join"       -> q4,
    "q5_anti_join"       -> q5,
    "q6_selective_agg"   -> q6,
    "q7_window_rank"     -> q7,
    "q8_set_ops"         -> q8,
    "q9_rollup"          -> q9)

  override def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_star_join"       -> q2Sql,
    "q3_topk_revenue"    -> q3Sql,
    "q4_semi_join"       -> q4Sql,
    "q5_anti_join"       -> q5Sql,
    "q6_selective_agg"   -> q6Sql,
    "q7_window_rank"     -> q7Sql,
    "q8_set_ops"         -> q8Sql,
    "q9_rollup"          -> q9Sql)
}
