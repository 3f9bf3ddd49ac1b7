package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] instantiates one operator family from
  * SURVEY.md §2 as a concrete query over the TPC-H-ish testdata tables
  * (FIXTURES.md §2); [[oracleSql]] holds the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01.
  *
  * Determinism rules used throughout (cross-engine hash-match):
  *  - money sums go through integer cents (`round(x*100)::bigint`) so double
  *    summation order can never flip a low bit;
  *  - every ranking has a total-order tiebreak;
  *  - column aliases are identical in the Spark plan and the oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact integer cents of a 2-decimal money double — associative sum. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Query catalog. Key prefix groups: q0x core agg/filter, q1x joins,
  // q2x window/sort/set/dedup, q3x scalar-function surface, q4x
  // validation/audit/merge, q5x training-data extensions, q6x events.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A5/A6/A7 hash aggregate with partial+final combine (SURVEY §2.4).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P4/P6 projection + conjunctive predicates pushed to parquet
    // (SURVEY §2.2 P1-P6).
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice") * col("l_discount")).as("disc_cents"))
    }),

    // J1+J3 chained inner equi-joins (small dims auto-broadcast) +
    // group-count per nation (SURVEY §2.3 J1/J3, §2.4 A5/A7).
    "q10_join_revenue_by_nation" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // J2+A6 left outer join with null-skipping COUNT(col): orders with no
    // high-quantity lines must count 0, not disappear (SURVEY §2.3 J2, §2.4 A6).
    "q11_left_join_null_count" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"))
      ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_outer")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_linenumber")).as("big_lines"))
    }),

    // P7/J5 NOT IN → null-aware anti join: customers with no urgent orders
    // (SURVEY §2.2 P7, §2.3 J5).
    "q12_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    }),

    // Semi join (EXISTS): customers with at least one urgent order.
    "q13_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
    }),

    // W1 per-group top-k via ranking window: top 2 orders per customer
    // (SURVEY §2.5 W1 — replaces the reference's per-category LIMIT loop,
    // process_publications_dag.py:161-178, with one shuffle).
    "q20_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // O1/O2/O3 global top-k with tiebreak → TakeOrderedAndProject
    // (SURVEY §2.6).
    "q21_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    }),

    // A8 HAVING on aggregate (duplicate-key detection shape,
    // process_publications_dag.py:489).
    "q22_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .filter(col("n_orders") > 12)
    }),

    // Set-distinct projection (SURVEY §2.4 A1 non-keyed half).
    "q23_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sum_price_cents,
        |  sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS sum_disc_price_cents,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice*l_discount*100) AS BIGINT) AS disc_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,
    "q10_join_revenue_by_nation" ->
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q11_left_join_null_count" ->
      """SELECT o_orderkey, count(l_linenumber) AS big_lines
        |FROM orders LEFT JOIN
        |  (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45) li
        |  ON o_orderkey = li.l_orderkey
        |GROUP BY o_orderkey""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q13_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q20_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 2""".stripMargin,
    "q21_sort_limit" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q22_having" ->
      """SELECT o_custkey, count(o_orderkey) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING count(o_orderkey) > 12""".stripMargin,
    "q23_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
  )
}
