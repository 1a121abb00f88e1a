package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Tables._

/** Window functions, set ops, and the batch analogue of the streaming
  * windowed aggregation (SURVEY §2.7/§2.8 — engine additions beyond the
  * reference: it has no window functions or unions; we ship them because a
  * complete engine needs them, and `row_number` is what makes E9
  * deterministic).
  *
  * Scale notes: both windows partition by `user_id` (high cardinality → good
  * parallelism, one hash shuffle, then in-partition sort); the running sum
  * uses an explicit ROWS frame (the default RANGE frame sorts + scans peers).
  */
object WindowQueries {

  /** row_number per key ordered by event time (tiebreak on unique id). */
  def rowNumber(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"), row_number().over(w).as("rn"))
      .orderBy("event_id")
  }

  /** Running (cumulative) sum per key — decimal-routed for exact parity. */
  def runningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(12, 2))).over(w)
          .cast(DecimalType(18, 2)).cast("double").as("running_value"))
      .orderBy("event_id")
  }

  /** RANGE-frame window (event-time sliding aggregate): each event's sum
    * of the same user's values over the trailing hour. A different
    * physical operator family from ROWS frames — bounds move by ORDER-KEY
    * VALUE, so all equal-key rows share one frame and the frame size is
    * data-dependent. Order key is epoch SECONDS (integer) so both engines
    * agree on boundaries exactly; sums run in DECIMAL. */
  def trailingHourSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    events(s, d)
      .select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(12, 2))).over(w)
          .cast(DecimalType(18, 2)).cast("double").as("trailing_hour_value"))
      .orderBy("event_id")
  }

  /** Per-group top-k via rank over a descending ordering (classic pattern the
    * reference's Power-BI layer would push down; TakeOrdered per group). */
  def topPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .select(col("event_type"), col("event_id"),
        col("value"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("event_type", "rk")
  }

  /** unionByName of two heterogeneous projections (SURVEY §2.7). */
  def unionByNameCounts(s: SparkSession, d: String): DataFrame = {
    val a = lineitem(s, d).select(lit("lineitem").as("src"), col("l_returnflag").as("flag"))
    val b = orders(s, d).select(lit("orders").as("src"), col("o_orderstatus").as("flag"))
    a.unionByName(b)
      .groupBy("src", "flag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("src", "flag")
  }

  /** T5 batch analogue (SURVEY §2.8): tumbling 1-hour window count by type —
    * the same groupBy(window) aggregation `graft.streaming` runs on a stream;
    * phrased with date_trunc so the DuckDB oracle can express it. */
  def hourlyCounts(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("window_start", "event_type")

  /** lag/lead/first_value/last_value — the value-offset window family
    * (each value exact: ids and floored epoch seconds, no float drift). */
  def lagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_id")).over(frame).as("first_id"),
        last(col("event_id")).over(frame).as("last_id"))
      .orderBy("event_id")
  }

  /** Distribution ranks: ntile / percent_rank / cume_dist over one
    * per-user ordering (deterministic: event_id breaks all ties; the two
    * ratio ranks round through DECIMAL like every float output). */
  def distributionRanks(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).cast(DecimalType(18, 6)).cast("double").as("pct_rank"),
        round(cume_dist().over(w), 6).cast(DecimalType(18, 6)).cast("double").as("cume"))
      .orderBy("event_id")
  }

  /** EXCEPT / INTERSECT set operations: user-id sets of two event slices
    * (purchase-but-never-error, purchase-and-error). */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchasers = ev.filter(col("event_type") === "purchase").select("user_id")
    val erroring = ev.filter(col("event_type") === "error").select("user_id")
    val only = purchasers.except(erroring).withColumn("relation", lit("only_purchase"))
    val both = purchasers.intersect(erroring).withColumn("relation", lit("both"))
    only.unionByName(both).orderBy("relation", "user_id")
  }

  /** Time-series gap filling: hourly event counts with MISSING hours
    * materialized at 0 — the hour spine comes from `sequence(min, max)`
    * (a 1-row broadcast, then a generator), left-joined to the actual
    * counts. The standard resampling shape dashboards need. */
  def gapFilledHourly(s: SparkSession, d: String): DataFrame = {
    val hours = events(s, d).select(date_trunc("hour", col("ts")).as("h"))
    val counts = hours.groupBy("h").agg(count(lit(1)).as("cnt"))
    val spine = hours.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    spine.join(counts, Seq("h"), "left")
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("hour")
  }

  /** SCD Type 2 over the event log ([[graft.operators.Scd]]): each user
    * event versioned with a validity interval; the open row is current. */
  def scd2Versions(s: SparkSession, d: String): DataFrame =
    graft.operators.Scd.scd2(events(s, d), "user_id", "ts", "event_id")
      .select("user_id", "event_id", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from", "event_id")

  /** Semi-structured access: JSON path extraction from the props column,
    * via both the string-path (`get_json_object`) and the typed
    * (`from_json` struct) routes — same value either way. */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_typed"))
      .orderBy("event_id")

  /** Gap-based sessionization over the event log (30-minute gap): per-user
    * session index, event count, span — [[graft.operators.Sessionize]]. */
  def sessionStats(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionStats(
        events(s, d), keyCol = "user_id", tsCol = "ts",
        gapSeconds = 1800L, tieCol = "event_id")
      .select("user_id", "session_index", "n_events", "span_s")
      .orderBy("user_id", "session_index")

  /** Interval join: each purchase matched to every signup by the same user
    * in the preceding hour (the range-join cousin of the as-of join, which
    * keeps only the latest). */
  def purchasesWithRecentSignups(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"), col("ts").as("s_ts"))
    graft.operators.Sessionize.rangeJoin(
        purchases, signups, keyCol = "user_id",
        leftTs = "p_ts", rightTs = "s_ts", windowSeconds = 3600L)
      .select("purchase_id", "signup_id", "user_id")
      .orderBy("purchase_id", "signup_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rownum"  -> (rowNumber _),
    "q_window_running" -> (runningSum _),
    "q_window_range"   -> (trailingHourSum _),
    "q_window_topk"    -> (topPerGroup _),
    "q_union_byname"   -> (unionByNameCounts _),
    "q_hourly_counts"  -> (hourlyCounts _),
    "q_sessionize"     -> (sessionStats _),
    "q_range_join"     -> (purchasesWithRecentSignups _),
    "q_window_lag"     -> (lagLead _),
    "q_window_ntile"   -> (distributionRanks _),
    "q_set_ops"        -> (setOps _),
    "q_scd2"           -> (scd2Versions _),
    "q_json_funcs"     -> (jsonFuncs _),
    "q_gapfill"        -> (gapFilledHourly _),
  )

  val oracle: Map[String, String] = Map(
    "q_window_rownum" ->
      """SELECT event_id, user_id,
                row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         FROM events ORDER BY event_id""",
    "q_window_running" ->
      """SELECT event_id, user_id,
                CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
                  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS running_value
         FROM events ORDER BY event_id""",
    "q_window_range" ->
      """SELECT event_id, user_id,
                CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
                  PARTITION BY user_id
                  ORDER BY (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS trailing_hour_value
         FROM events ORDER BY event_id""",
    "q_window_topk" ->
      """SELECT * FROM (
           SELECT event_type, event_id, value,
                  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
           FROM events) WHERE rk <= 3
         ORDER BY event_type, rk""",
    "q_union_byname" ->
      """SELECT src, flag, count(*) AS cnt FROM (
           SELECT 'lineitem' AS src, l_returnflag AS flag FROM lineitem
           UNION ALL
           SELECT 'orders' AS src, o_orderstatus AS flag FROM orders)
         GROUP BY src, flag ORDER BY src, flag""",
    "q_hourly_counts" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // epoch floored to whole seconds on both sides: sub-second precision is
    // engine-specific, whole-second gap arithmetic is not
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
                    FROM events),
            g AS (SELECT user_id, event_id, sec,
                         CASE WHEN lag(sec) OVER w IS NULL
                                OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
            s AS (SELECT user_id, sec,
                         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
                  FROM g)
         SELECT CAST(user_id AS BIGINT) AS user_id,
                session_index,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(sec) - min(sec) AS BIGINT) AS span_s
         FROM s GROUP BY user_id, session_index
         ORDER BY user_id, session_index""",
    "q_window_lag" ->
      """SELECT event_id, user_id,
                lag(event_id, 1)  OVER w AS prev_id,
                lead(event_id, 1) OVER w AS next_id,
                first_value(event_id) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_id,
                last_value(event_id) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY event_id""",
    "q_window_ntile" ->
      """SELECT event_id, user_id,
                ntile(4) OVER w AS quartile,
                CAST(CAST(round(percent_rank() OVER w, 6) AS DECIMAL(18,6)) AS DOUBLE) AS pct_rank,
                CAST(CAST(round(cume_dist() OVER w, 6) AS DECIMAL(18,6)) AS DOUBLE) AS cume
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY event_id""",
    "q_set_ops" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
            e AS (SELECT user_id FROM events WHERE event_type = 'error')
         SELECT user_id, 'only_purchase' AS relation FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
         UNION ALL
         SELECT user_id, 'both' AS relation FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
         ORDER BY relation, user_id""",
    "q_gapfill" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events),
            c AS (SELECT h, count(*) AS cnt FROM e GROUP BY h),
            s AS (SELECT unnest(generate_series((SELECT min(h) FROM e),
                                                (SELECT max(h) FROM e),
                                                INTERVAL 1 HOUR)) AS h)
         SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
                coalesce(c.cnt, 0) AS cnt
         FROM s LEFT JOIN c ON s.h = c.h
         ORDER BY hour""",
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
                    FROM events)
         SELECT user_id, event_id, sec AS valid_from,
                lead(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS valid_to,
                lead(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL AS is_current
         FROM e ORDER BY user_id, valid_from, event_id""",
    "q_json_funcs" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
         FROM events ORDER BY event_id""",
    "q_range_join" ->
      """SELECT p.event_id AS purchase_id, s.event_id AS signup_id, p.user_id
         FROM (SELECT user_id, event_id,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
               FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT user_id, event_id,
                      CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
               FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND s.sec >= p.sec - 3600 AND s.sec <= p.sec
         ORDER BY purchase_id, signup_id""",
  )
}
