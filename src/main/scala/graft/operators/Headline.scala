package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Headline multi-join analytics (TPC-H-shaped) + subquery surface.
  *
  * The reference has no multi-table queries at all (its only "query" is a
  * graph traversal over one adjacency file, `Assignment2/secondary_server.c:
  * 537-559`) — these are the Part-B capstones that exercise join ordering,
  * broadcast selection, and partial aggregation across 3–6 tables at once.
  *
  * Scale posture: filters sit directly on the scans (pushed to parquet);
  * the dim side of every join is either genuinely small (region/nation —
  * explicitly broadcast) or becomes small after filtering (the BUILDING
  * customer slice), where AQE's runtime size estimate flips the join to
  * broadcast without hand-tuning. Revenue ranking follows the oracle
  * discipline: rank on the ROUNDED aggregate with a key tie-break so engine
  * ulp differences can't flip the top-k boundary.
  */
object Headline extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // Raw scan where the first operator is a pushed filter + its own shuffle.
  private def tr(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.raw(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape — shipping priority: top-10 undelivered orders of one
    // market segment by revenue. 3-way join, group on the order, top-k on
    // the rounded aggregate.
    "q_tpch_q3" -> ((s, dir) => {
      val c = tr(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val cutoff = lit("1997-01-01").cast("timestamp")
      val o = tr(s, dir, "orders").filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = tr(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_orderdate"), col("revenue"))
    }),

    // TPC-H Q5 shape — local supplier volume: revenue from orders where the
    // supplier and the customer share the nation, one region, one year.
    // 6-way join; region/nation broadcast explicitly, supplier joins on
    // (suppkey) with the nation-equality as residual.
    "q_tpch_q5" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = tr(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = tr(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = tr(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = tr(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Correlated scalar subquery: orders ≥ 1.5× their customer's average
    // order value. Catalyst decorrelates this into an aggregate + join —
    // the scalable plan — rather than a per-row re-scan.
    "q_subquery_corr" -> ((s, dir) =>
      graft.SqlViews.withViews(s, "orders_sq" -> tr(s, dir, "orders")) { v =>
        s.sql(s"""
          SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS tp
          FROM ${v("orders_sq")} o
          WHERE ROUND(o_totalprice, 2) >= ROUND(1.5 * (SELECT AVG(o2.o_totalprice)
                                                       FROM ${v("orders_sq")} o2
                                                       WHERE o2.o_custkey = o.o_custkey), 2)
          ORDER BY o_orderkey""")
      }),

    // IN / NOT IN subqueries (rewritten by Catalyst to semi/anti joins):
    // urgent-order customers with no error events.
    "q_subquery_in" -> ((s, dir) =>
      graft.SqlViews.withViews(s,
        "customer_sq" -> tr(s, dir, "customer"),
        "orders_sq2" -> tr(s, dir, "orders"),
        "events_sq" -> t(s, dir, "events")) { v =>
        s.sql(s"""
          SELECT c_custkey, c_mktsegment
          FROM ${v("customer_sq")}
          WHERE c_custkey IN (SELECT o_custkey FROM ${v("orders_sq2")}
                              WHERE o_orderpriority = '1-URGENT')
            AND c_custkey NOT IN (SELECT user_id FROM ${v("events_sq")}
                                  WHERE event_type = 'error')
          ORDER BY c_custkey""")
      })
  )

  def oracles: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, revenue
         FROM (SELECT o_orderkey, o_orderdate,
                 ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
               FROM customer JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON l_orderkey = o_orderkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1997-01-01'
                 AND l_shipdate > TIMESTAMP '1997-01-01'
               GROUP BY o_orderkey, o_orderdate)
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q_tpch_q5" ->
      """SELECT n_name,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    // Both sides of the threshold are ROUNDed to cents (in Spark too) so a
    // boundary row can't flip on last-ulp differences of a partition-order-
    // dependent double AVG — the engine-stable predicate form.
    "q_subquery_corr" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS tp
         FROM orders o
         WHERE ROUND(o_totalprice, 2) >= ROUND(1.5 * (SELECT AVG(o2.o_totalprice)
                                                      FROM orders o2
                                                      WHERE o2.o_custkey = o.o_custkey), 2)
         ORDER BY o_orderkey""",
    "q_subquery_in" ->
      """SELECT c_custkey, c_mktsegment
         FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
           AND c_custkey NOT IN (SELECT user_id FROM events
                                 WHERE event_type = 'error')
         ORDER BY c_custkey"""
  )
}
