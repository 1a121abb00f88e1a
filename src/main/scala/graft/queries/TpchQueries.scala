package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables._

/** Classic analytical workloads (TPC-H shapes 1/3/6 transplanted onto the
  * testdata schema) — the "could a reference user run their analytics here"
  * proof. Internal arithmetic is decimal-exact so Spark and DuckDB sum
  * identically; every FINAL output column is cast to double so both engines
  * reach the comparator as float64 (Decimal('x.00') vs float 'x.0' would
  * otherwise hash differently despite equal values).
  */
object TpchQueries {

  private def dec(c: String) = col(c).cast(DecimalType(12, 2))

  /** Q1 shape: big scan, low-cardinality group, many aggregates. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast(DecimalType(18, 2)).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast(DecimalType(18, 2)).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) - dec("l_discount")))
          .cast(DecimalType(18, 4)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q3 shape: 3-way join + filtered group + top-10 by aggregate. */
  def shippingPriority(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1995-03-15"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) - dec("l_discount")))
        .cast(DecimalType(18, 4)).cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Q6 shape: pure scan-filter-aggregate (the pushdown benchmark). */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount"))
        .cast(DecimalType(18, 4)).cast("double").as("revenue"))

  /** Q14 shape: join + conditional-aggregate ratio (promo revenue share of
    * one shipping month). Both decimal sums cast to double BEFORE the
    * division — decimal division scale rules differ across engines, double
    * division of identical doubles does not. */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val rev = dec("l_extendedprice") *
      (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) - dec("l_discount"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(12, 2))))
          .cast(DecimalType(18, 4)).cast("double").as("promo_rev"),
        sum(rev).cast(DecimalType(18, 4)).cast("double").as("total_rev"))
      .select(round(lit(100.0) * col("promo_rev") / col("total_rev"), 4).as("promo_revenue_pct"))
  }

  /** Q18 shape: large-volume orders — aggregate-then-join with a HAVING
    * build side (the classic "group, filter on the aggregate, enrich"). */
  def largeOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).cast(DecimalType(18, 2)).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 150)
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast("double").as("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q5 shape: the 6-table snowflake join — region filters nation, nation
    * qualifies the supplier side, customer→orders→lineitem carries the
    * volume, and the `c_nationkey = s_nationkey` equality closes the
    * "local supplier" cycle. Plan: region/nation/supplier/customer all
    * broadcast-sized against the fact chain; one low-cardinality agg. */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val rev = dec("l_extendedprice") *
      (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) - dec("l_discount"))
    val asiaNations = nation(s, d)
      .join(region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    customer(s, d).select("c_custkey", "c_nationkey")
      .join(orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(rev).cast(DecimalType(18, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q4 shape: EXISTS semi-join with a correlated inequality, then a
    * low-cardinality aggregate — orders in one quarter that have at least
    * one line shipped after the order date. The semi-join dedups
    * build-side matches before the count (no fan-out, unlike an inner
    * join + distinct). */
  def latePriorityOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01") && col("o_orderdate") < lit("1996-10-01"))
      .join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Q12 shape: fact filter + join + dual conditional counts (the
    * CASE-inside-SUM pivot), grouped by a low-cardinality line attribute
    * (the synthetic schema's return flag stands in for ship mode). */
  def returnflagPriority(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_returnflag")

  /** Q10 shape: returned-item reporting — which customers returned the most
    * revenue in a quarter. Fact filter (one quarter + return flag) before
    * the joins, customer/nation enrichment broadcast-sized against the
    * filtered fact stream, top-20 by the aggregate (TakeOrdered, no global
    * sort). */
  def returnedItemReport(s: SparkSession, d: String): DataFrame = {
    val rev = dec("l_extendedprice") *
      (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) - dec("l_discount"))
    lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(orders(s, d).filter(
          col("o_orderdate") >= lit("1996-10-01") && col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(rev).cast(DecimalType(18, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch5_local"    -> (localSupplierVolume _),
    "q_tpch10_returns" -> (returnedItemReport _),
    "q_tpch4_late"     -> (latePriorityOrders _),
    "q_tpch12_modes"   -> (returnflagPriority _),
    "q_tpch1_pricing"  -> (pricingSummary _),
    "q_tpch3_shipping" -> (shippingPriority _),
    "q_tpch6_forecast" -> (forecastRevenue _),
    "q_tpch14_promo"   -> (promoRevenue _),
    "q_tpch18_large"   -> (largeOrders _),
  )

  val oracle: Map[String, String] = Map(
    "q_tpch10_returns" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",
    "q_tpch4_late" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_tpch12_modes" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q_tpch5_local" ->
      """SELECT n_name,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_tpch1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_tpch3_shipping" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q_tpch14_promo" ->
      """WITH j AS (
           SELECT CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev,
                  p_type
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
         SELECT round(100.0 *
                  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,4)) AS DOUBLE)
                  / CAST(CAST(sum(rev) AS DECIMAL(18,4)) AS DOUBLE), 4) AS promo_revenue_pct
         FROM j""",
    "q_tpch18_large" ->
      """WITH big AS (
           SELECT l_orderkey,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) > 150)
         SELECT c_custkey, c_name, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
                sum_qty
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN big    ON o_orderkey = l_orderkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 100""",
    "q_tpch6_forecast" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
  )
}
