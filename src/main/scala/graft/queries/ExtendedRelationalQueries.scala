package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables._

/** Engine additions beyond the reference's operator set (SURVEY §2.7 notes
  * the reference has none of these): the join/aggregation vocabulary a
  * complete engine owes its users. Each is oracle-checked.
  *
  * Ordering discipline: Spark sorts NULLS FIRST ascending by default,
  * DuckDB NULLS LAST — every oracle ORDER BY pins NULLS FIRST explicitly.
  */
object ExtendedRelationalQueries {

  /** Left-semi join (EXISTS): customers with at least one urgent order. */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    customer(s, d).join(urgent, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-outer join with null-producing right side: every customer with its
    * urgent-order count (0 for none — coalesced aggregate). */
  def leftJoinAgg(s: SparkSession, d: String): DataFrame = {
    val urgentCounts = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_urgent"))
    customer(s, d)
      .join(urgentCounts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
      .orderBy("c_custkey")
  }

  /** Rollup: subtotals per (returnflag, linestatus), per returnflag, grand
    * total — decimal-routed sums, null group keys ordered NULLS FIRST. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("qty").cast(DecimalType(18, 2)).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact distinct-count aggregate (the reference's closest is A1+A2). */
  def countDistinct_(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Pivot-style conditional aggregation: one column per order status,
    * phrased as CASE sums so the DuckDB oracle states it identically. */
  def pivotAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
      .orderBy("o_orderpriority")

  /** HAVING: groups filtered on an aggregate (post-aggregation predicate). */
  def havingAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") > 100)
      .orderBy("l_suppkey")

  /** Correlated-style scalar aggregate comparison: orders above their
    * customer's average order value (window-based, one shuffle). */
  def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
      .withColumn("cust_avg", avg("price").over(w))
      .filter(col("price") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("price").cast("double").as("price"))
      .orderBy("o_orderkey")
  }

  /** Exact interpolated median per group — routed by input size through
    * [[graft.operators.ExactQuantiles.byGroupAuto]]: small inputs take the
    * built-in `percentile` buffer (faster while it fits), large inputs the
    * spillable (value, count) rollup (the buffer OOM'd the 100× sweep —
    * see that operator's scaladoc). Both routes are bit-identical to each
    * other and to DuckDB `quantile_cont` (spec-pinned); DECIMAL-rounded
    * anyway. */
  def medianAgg(s: SparkSession, d: String): DataFrame =
    graft.operators.ExactQuantiles
      .byGroupAuto(lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5),
        graft.util.InputSize.bytes(s, s"$d/lineitem.parquet"))
      .select(col("l_returnflag"),
        round(col("p50"), 4).cast(DecimalType(18, 4)).cast("double").as("p50"))
      .orderBy("l_returnflag")

  /** CUBE: all 2^2 grouping combinations, decimal sums, NULLS FIRST. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum("price").cast(DecimalType(18, 2)).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Collect-and-sort aggregation: deterministic listagg equivalent
    * (collect_set → array_sort → array_join works in both engines). */
  def collectAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        array_join(array_sort(collect_set(col("l_linenumber").cast("string"))), ",").as("linenos"))
      .orderBy("l_returnflag")

  /** arg-max / arg-min family: value of one column at another's extreme
    * (deterministic: the ordering column o_orderkey is unique). */
  def argMinMax(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        max(col("o_orderkey")).as("last_order"))
      .orderBy("o_custkey")

  /** GROUPING SETS with hand-picked sets (beyond rollup/cube's fixed
    * lattices): per-status, per-priority, and the grand total. */
  def groupingSetsAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Multi-quantile per group: exact interpolated p25/p50/p75 (same
    * engine-parity and spillable-plan argument as [[medianAgg]] — this
    * query, with THREE percentile buffers, is the one that actually OOM'd
    * the 8 GiB 100×-sweep JVM; all three quantiles now ride one
    * (value, count) rollup and one per-group window). */
  def quantilesAgg(s: SparkSession, d: String): DataFrame =
    graft.operators.ExactQuantiles
      .byGroupAuto(lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75),
        graft.util.InputSize.bytes(s, s"$d/lineitem.parquet"))
      .select(col("l_returnflag"),
        round(col("q25"), 4).cast(DecimalType(18, 4)).cast("double").as("q25"),
        round(col("q50"), 4).cast(DecimalType(18, 4)).cast("double").as("q50"),
        round(col("q75"), 4).cast(DecimalType(18, 4)).cast("double").as("q75"))
      .orderBy("l_returnflag")

  /** UNPIVOT (wide → long): part's numeric attributes melted to
    * (key, attr, val) rows via the native Dataset.unpivot. */
  def unpivotAttrs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "attr", "val")
      .orderBy("p_partkey", "attr")

  /** MERGE-INTO semantics ([[graft.ops.Upsert]]): orders merged with a
    * deterministic corrections batch — every key divisible by 10 gets a
    * repriced row (update), and shifted-key copies of keys divisible by
    * 1000 append (insert). */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val target = orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast(DecimalType(12, 2)).cast("double").as("o_totalprice"))
    // reprice in DECIMAL: round(double*1.1, 2) straddles cent boundaries
    // differently per engine; exact decimal product + half-up cast does not
    val updates = target.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice",
        (col("o_totalprice").cast(DecimalType(12, 2)) *
          lit(new java.math.BigDecimal("1.1")).cast(DecimalType(3, 1)))
          .cast(DecimalType(12, 2)).cast("double"))
    val inserts = target.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    graft.ops.Upsert.upsert(target, updates.unionByName(inserts), Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert"   -> (mergeUpsert _),
    "q_unpivot"        -> (unpivotAttrs _),
    "q_grouping_sets"  -> (groupingSetsAgg _),
    "q_quantiles"      -> (quantilesAgg _),
    "q_collect_agg"    -> (collectAgg _),
    "q_arg_minmax"     -> (argMinMax _),
    "q_median"         -> (medianAgg _),
    "q_cube"           -> (cubeAgg _),
    "q_semi_join"      -> (semiJoin _),
    "q_left_join_agg"  -> (leftJoinAgg _),
    "q_rollup"         -> (rollupAgg _),
    "q_count_distinct" -> (countDistinct_ _),
    "q_pivot"          -> (pivotAgg _),
    "q_having"         -> (havingAgg _),
    "q_above_cust_avg" -> (aboveCustomerAvg _),
  )

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH target AS (SELECT o_orderkey, o_custkey,
                                CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
                         FROM orders),
            -- explicit round(): DuckDB's decimal downscale CAST truncates,
            -- Spark's rounds half-up — round() rounds in both
            src AS (SELECT o_orderkey, o_custkey,
                           CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2)
                                AS DOUBLE) AS o_totalprice
                    FROM target WHERE o_orderkey % 10 = 0
                    UNION ALL
                    SELECT o_orderkey + 100000000, o_custkey, o_totalprice
                    FROM target WHERE o_orderkey % 1000 = 0)
         SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
         FROM target t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
         ORDER BY o_orderkey""",
    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
         ORDER BY p_partkey, attr""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_quantiles" ->
      """SELECT l_returnflag,
                CAST(CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DECIMAL(18,4)) AS DOUBLE) AS q25,
                CAST(CAST(round(quantile_cont(l_extendedprice, 0.5),  4) AS DECIMAL(18,4)) AS DOUBLE) AS q50,
                CAST(CAST(round(quantile_cont(l_extendedprice, 0.75), 4) AS DECIMAL(18,4)) AS DOUBLE) AS q75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_collect_agg" ->
      """SELECT l_returnflag,
                array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
                array_to_string(list_sort(list(DISTINCT CAST(l_linenumber AS VARCHAR))), ',') AS linenos
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_arg_minmax" ->
      """SELECT o_custkey,
                arg_max(o_orderstatus, o_orderkey) AS latest_status,
                arg_min(o_orderstatus, o_orderkey) AS first_status,
                max(o_orderkey) AS last_order
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q_median" ->
      """SELECT l_returnflag,
                CAST(CAST(round(quantile_cont(l_extendedprice, 0.5), 4) AS DECIMAL(18,4)) AS DOUBLE) AS p50
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_left_join_agg" ->
      """SELECT c_custkey, coalesce(u.n_urgent, 0) AS n_urgent
         FROM customer c
         LEFT JOIN (SELECT o_custkey, count(*) AS n_urgent FROM orders
                    WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
           ON c.c_custkey = u.o_custkey
         ORDER BY c_custkey""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_pivot" ->
      """SELECT o_orderpriority,
                count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_having" ->
      """SELECT l_suppkey, count(*) AS n_items FROM lineitem
         GROUP BY l_suppkey HAVING count(*) > 100 ORDER BY l_suppkey""",
    "q_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, CAST(price AS DOUBLE) AS price FROM (
           SELECT o_orderkey, o_custkey,
                  CAST(o_totalprice AS DECIMAL(12,2)) AS price,
                  avg(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey) AS cust_avg
           FROM orders)
         WHERE price > cust_avg ORDER BY o_orderkey""",
  )
}
