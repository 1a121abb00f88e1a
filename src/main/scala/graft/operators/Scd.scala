package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builder: a change-event log becomes
  * versioned dimension rows with validity intervals — the warehouse-side
  * twin of the streaming last-writer-wins upsert
  * ([[graft.streaming.StreamPipeline]] T6), for consumers that need
  * history, not just the latest value.
  *
  * Scale shape: one window over (key, ts, tie) — a single hash Exchange +
  * in-partition sort, O(1) state per row (`lead`). Timestamps floor to
  * epoch seconds for engine portability (same rule as
  * [[Sessionize]]).
  */
object Scd {

  /** Each input change-row becomes a version: `valid_from` = its event
    * time, `valid_to` = the next change's time (null = current version),
    * `is_current` flags the open row. Fully deterministic given a unique
    * `tieCol`. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val sec = col(tsCol).cast("long")
    val w = Window.partitionBy(keyCol).orderBy(sec, col(tieCol))
    df.withColumn("valid_from", sec)
      .withColumn("valid_to", lead(sec, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
