package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Product-analytics surface over the event stream + dataset profiling —
  * the reporting queries an ETL pipeline's consumers actually run against
  * the loaded tables: conversion funnels, cohort retention, and the
  * per-column data-quality profile that gates a load (the generalized form
  * of the reference pipeline's emptiness/required-column checks).
  *
  * Everything here is integer/timestamp arithmetic — counts, epoch-micro
  * lags, integer week offsets — so cross-engine parity is exact by
  * construction (no float discipline needed).
  */
object AnalyticsQueries {

  /** Three-stage conversion funnel view → click → purchase with strict
    * event-time ordering per user: stage 2 counts users whose first click
    * FOLLOWS their first view, stage 3 users whose first purchase follows
    * that click. `total_lag_us` sums each converting user's lag from
    * funnel entry (first view) to the stage event — the numerator of
    * "average time to convert".
    *
    * Scale shape: each stage is a type-filtered scan (filter pushed to
    * parquet) reduced map-side into per-user minima, then an equi-join on
    * user_id (high-cardinality, no fan-out — both sides are one row per
    * user). Nothing shuffles more than (user_id, ts) scalars; the final
    * union aggregates are 1-row frames. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id", "t_view").agg(min("ts").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id", "t_view").agg(min("ts").as("t_purchase"))
    v.agg(count(lit(1)).as("n_users"), lit(0L).as("total_lag_us"))
      .select(lit("1_view").as("stage"), col("n_users"), col("total_lag_us"))
      .unionByName(
        c.agg(count(lit(1)).as("n_users"),
            coalesce(sum(unix_micros(col("t_click")) - unix_micros(col("t_view"))), lit(0L))
              .as("total_lag_us"))
          .select(lit("2_click").as("stage"), col("n_users"), col("total_lag_us")))
      .unionByName(
        p.agg(count(lit(1)).as("n_users"),
            coalesce(sum(unix_micros(col("t_purchase")) - unix_micros(col("t_view"))), lit(0L))
              .as("total_lag_us"))
          .select(lit("3_purchase").as("stage"), col("n_users"), col("total_lag_us")))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users cohorted by the week of their first
    * signup event; a cohort member is retained in week k if ANY of their
    * events lands k whole weeks after the cohort week (k = 0 is the signup
    * week itself). Both engines truncate weeks to Monday, and the offset is
    * integer arithmetic on epoch microseconds, so boundaries are exact.
    *
    * Scale shape: signup minima reduce map-side per user; the activity
    * join is user_id equi (one cohort row per user — no fan-out); the
    * distinct collapses (user, cohort, week) before the final
    * ≤ weeks²-group rollup. Events shuffle as (user_id, week) scalars. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min("ts")).as("w0"))
    ev.select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .join(cohorts, "user_id")
      .filter(col("w") >= col("w0"))
      .select(col("user_id"), col("w0"), col("w")).distinct()
      .select(
        date_format(col("w0"), "yyyy-MM-dd").as("cohort_week"),
        expr("(unix_micros(w) - unix_micros(w0)) div 604800000000").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Per-column data-quality profile of the orders table — row count,
    * null count, exact distinct count, numeric min/max (timestamps as
    * epoch microseconds; every stat lands in BIGINT/exact-double) — the
    * generalized load-gate audit. ONE scan: all four columns' statistics
    * aggregate in a single pass (Catalyst plans the multi-distinct via
    * Expand — still one pass over the parquet), then unpivot via stack.
    * At 100 TB this is the difference between one corpus read and one
    * per profiled column. */
  def profileOrders(s: SparkSession, d: String): DataFrame = {
    // o_orderdate arrives TIMESTAMP_NTZ from the driver parquet; reinterpret
    // in the UTC session zone (instant unchanged — the Tables.events rule)
    // so unix_micros applies
    val o = normalizeEventTs(orders(s, d), "o_orderdate")
    val row = o.agg(
      count(lit(1)).as("n_rows"),
      sum(col("o_orderkey").isNull.cast("long")).as("nn_ok"),
      countDistinct(col("o_orderkey")).as("nd_ok"),
      min("o_orderkey").cast("double").as("mn_ok"),
      max("o_orderkey").cast("double").as("mx_ok"),
      sum(col("o_custkey").isNull.cast("long")).as("nn_ck"),
      countDistinct(col("o_custkey")).as("nd_ck"),
      min("o_custkey").cast("double").as("mn_ck"),
      max("o_custkey").cast("double").as("mx_ck"),
      sum(col("o_totalprice").isNull.cast("long")).as("nn_tp"),
      countDistinct(col("o_totalprice")).as("nd_tp"),
      min("o_totalprice").cast("double").as("mn_tp"),
      max("o_totalprice").cast("double").as("mx_tp"),
      sum(col("o_orderdate").isNull.cast("long")).as("nn_od"),
      countDistinct(col("o_orderdate")).as("nd_od"),
      unix_micros(min("o_orderdate")).cast("double").as("mn_od"),
      unix_micros(max("o_orderdate")).cast("double").as("mx_od"))
    row.select(col("n_rows"), expr(
      """stack(4,
           'o_custkey',    nn_ck, nd_ck, mn_ck, mx_ck,
           'o_orderdate',  nn_od, nd_od, mn_od, mx_od,
           'o_orderkey',   nn_ok, nd_ok, mn_ok, mx_ok,
           'o_totalprice', nn_tp, nd_tp, mn_tp, mx_tp)
         AS (col_name, n_null, n_distinct, min_v, max_v)"""))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }

  /** Hot-key aggregation through [[graft.operators.Skew.saltedSumCount]],
    * declared as an oracle-gated query: event_type has single-digit
    * cardinality, so at 100 TB a plain `groupBy(event_type)` concentrates
    * the whole reduce on a handful of reducers — the salted two-phase plan
    * spreads each key over `saltFactor` partials first, then merges the
    * (key, salt) partials in a catalog-sized final aggregate. The oracle is
    * the UNSALTED spelling, so a hash match proves the rewrite is
    * value-neutral. Values sum in exact integer milli-units (floor(v·1000)
    * — IEEE-identical in both engines) so no accumulation order can
    * diverge; the salt column never reaches the output. */
  def saltedAgg(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"),
      floor(col("value") * lit(1000d)).cast("long").as("v_milli"))
    graft.operators.Skew.saltedSumCount(ev, "event_type", "v_milli", saltFactor = 8)
      .orderBy("event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"     -> (funnel _),
    "q_retention"  -> (retention _),
    "q_profile"    -> (profileOrders _),
    "q_salted_agg" -> (saltedAgg _),
  )

  val oracle: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT event_type,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
                count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, v.t_view, min(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t_view
               GROUP BY e.user_id, v.t_view),
         p AS (SELECT e.user_id, c.t_view, min(e.ts) AS t_purchase
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t_click
               GROUP BY e.user_id, c.t_view)
       SELECT * FROM (
         SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
                CAST(0 AS BIGINT) AS total_lag_us FROM v
         UNION ALL
         SELECT '2_click', CAST(count(*) AS BIGINT),
                CAST(coalesce(sum(epoch_us(t_click) - epoch_us(t_view)), 0) AS BIGINT) FROM c
         UNION ALL
         SELECT '3_purchase', CAST(count(*) AS BIGINT),
                CAST(coalesce(sum(epoch_us(t_purchase) - epoch_us(t_view)), 0) AS BIGINT) FROM p)
       ORDER BY stage""",
    "q_retention" ->
      """WITH su AS (SELECT user_id, date_trunc('week', min(ts)) AS w0 FROM events
                     WHERE event_type = 'signup' GROUP BY user_id),
         act AS (SELECT DISTINCT e.user_id, s.w0, date_trunc('week', e.ts) AS w
                 FROM events e JOIN su s ON e.user_id = s.user_id
                 WHERE date_trunc('week', e.ts) >= s.w0)
       SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
              (epoch_us(w) - epoch_us(w0)) // 604800000000 AS week_offset,
              CAST(count(*) AS BIGINT) AS n_users
       FROM act
       GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_profile" ->
      """WITH s AS (
           SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                  CAST(min(o_custkey) AS DOUBLE) AS min_v, CAST(max(o_custkey) AS DOUBLE) AS max_v
           FROM orders
           UNION ALL
           SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(o_orderdate) AS BIGINT),
                  CAST(count(DISTINCT o_orderdate) AS BIGINT),
                  CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
                  CAST(epoch_us(max(o_orderdate)) AS DOUBLE)
           FROM orders
           UNION ALL
           SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(o_orderkey) AS BIGINT),
                  CAST(count(DISTINCT o_orderkey) AS BIGINT),
                  CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE)
           FROM orders
           UNION ALL
           SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(o_totalprice) AS BIGINT),
                  CAST(count(DISTINCT o_totalprice) AS BIGINT),
                  CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
           FROM orders)
       SELECT col_name, n_rows, n_null, n_distinct, min_v, max_v
       FROM s ORDER BY col_name""",
  )
}
