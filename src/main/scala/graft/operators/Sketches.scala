package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark) — the approximate tier above [[graft.queries]]' exact
  * `count_distinct`.
  *
  * Why this matters at 100 TB: exact distinct counting shuffles every key;
  * an HLL sketch is a few KB per group, computes in one partial-aggregate
  * pass, and — the real point — MERGES: per-day / per-partition sketches
  * union into weekly/monthly/corpus-wide counts without re-reading the
  * data. That pre-aggregation pattern (store sketches, merge on query) is
  * how dashboard-scale distinct stats stay interactive.
  *
  * Approximate by construction → no DuckDB oracle row; accuracy and
  * mergeability are pinned in SketchesSpec (estimate within HLL's published
  * error envelope of the exact count; merged == whole-data sketch).
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (lgK = log2 of the register count:
    * 12 → 4 KB sketches, ~1.6% relative standard error). */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Distinct-count estimate from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Merge partial sketches (e.g. per-day → per-month): the union is again
    * a sketch, so merging composes indefinitely. */
  def merge(df: DataFrame, groupCols: Seq[String],
            sketchCol: String = "hll"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("hll"))
}
