package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: the batch twin of streaming session windows
  * (`graft.streaming` covers the stateful variant) — standard event-log
  * analytics the reference's dashboard layer would need at scale.
  *
  * Scale shape: both window passes (lag for the gap test, running sum for
  * the session index) share one (key, ts, tie) partitioning/ordering, so
  * Catalyst plans a SINGLE Exchange + sort for the whole operator; the
  * follow-up per-session aggregate reuses the same hash partitioning.
  *
  * Timestamps are floored to epoch seconds before the gap compare so the
  * semantics are engine-portable (sub-second precision differs across
  * engines; whole-second gaps do not).
  */
object Sessionize {

  /** Adds `session_index` (1-based per key): a new session starts when the
    * gap from the previous event exceeds `gapSeconds`. `tieCol` breaks
    * equal-timestamp ordering so the result is fully deterministic. Output
    * carries exactly the input columns plus `session_index`. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val sec = col(tsCol).cast("long")
    val w = Window.partitionBy(keyCol).orderBy(sec, col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(sec, 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || sec - col("__prev") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_index", sum(col("__new")).over(run))
      .drop("__prev", "__new")
  }

  /** Per-session rollup: event count and span (seconds, floored). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long, tieCol: String): DataFrame = {
    val sec = col(tsCol).cast("long")
    sessionize(df, keyCol, tsCol, gapSeconds, tieCol)
      .groupBy(col(keyCol), col("session_index"))
      .agg(count(lit(1)).as("n_events"),
        (max(sec) - min(sec)).as("span_s"))
  }

  /** Interval (range) join: every left row matched to right rows of the same
    * key whose timestamp falls in [leftTs - windowSeconds, leftTs]. The
    * equi-key keeps the join hash/sort-merge partitioned; the range predicate
    * evaluates post-match — no cartesian explosion.
    *
    * Both inputs are aliased so every join reference is qualified: the two
    * sides often derive from the SAME source frame (self-join on an event
    * log) and may share the timestamp column name — unqualified `col(...)`
    * would be ambiguous, and same-lineage `left(k) === right(k)` triggers
    * Spark's trivially-true-predicate rewrite. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                leftTs: String, rightTs: String, windowSeconds: Long): DataFrame = {
    val la = left.alias("__rj_l")
    val ra = right.alias("__rj_r")
    val l = col(s"__rj_l.$leftTs").cast("long")
    val r = col(s"__rj_r.$rightTs").cast("long")
    la.join(ra,
      col(s"__rj_l.$keyCol") === col(s"__rj_r.$keyCol") &&
        r >= l - windowSeconds && r <= l)
      .drop(col(s"__rj_r.$keyCol"))
  }
}
