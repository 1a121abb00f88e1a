package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group quantiles with a SPILLABLE plan.
  *
  * Spark's exact `percentile` aggregate buffers a value→count map PER TASK
  * per group; on a corpus whose measure column has many distinct values the
  * buffer is corpus-sized and the executor OOMs — found for real when
  * q_quantiles (three percentile buffers) killed the 8 GiB sweep JVM on the
  * 60 M-row 100× tier (task OOM in the partial aggregate, stage 3330).
  * Exact quantiles at scale must not live in an in-memory agg buffer; the
  * classical fix is to make the distribution EXPLICIT:
  *
  *   1. `groupBy(group, value).count()` — a spillable hash aggregate whose
  *      shuffle carries one row per DISTINCT (group, value), with map-side
  *      combine doing the per-task compression the percentile buffer was
  *      attempting, except bounded and spillable;
  *   2. a per-group window over the distinct values (sort-based,
  *      disk-spillable) accumulates cumulative counts;
  *   3. each requested quantile's bracketing positions are located by a
  *      row-wise range test on [cum − cnt, cum) — no second shuffle — and
  *      reduced with a catalog-sized min rollup;
  *   4. the interpolation reproduces `Percentile.getPercentile`'s exact
  *      arithmetic — `position = q · (N−1)`, `lower = floor`, `higher =
  *      ceil`, `vLow · (higher − position) + vHigh · (position − lower)` —
  *      so results are BIT-IDENTICAL to the built-in (spec-pinned), and
  *      every DuckDB `quantile_cont` oracle is unchanged.
  *
  * Worst case (all values distinct) this sorts each group's values — the
  * irreducible cost of EXACT quantiles — but sort-based operators spill;
  * the agg-buffer plan just dies. (The approximate-at-scale alternative,
  * `approx_percentile`'s KLL/t-digest state, trades exactness for O(k)
  * state; this operator keeps the exact contract the oracles gate.)
  */
object ExactQuantiles {

  /** Inputs at or under this many source bytes take the built-in
    * `percentile` aggregate (its per-task buffer is FASTER while it fits —
    * ~0.17 s vs ~0.5 s for the rollup at sf0.1 — and a 256 MB source's
    * distinct-value buffer comfortably fits any executor); larger inputs
    * route to the spillable rollup. Both routes are bit-identical
    * (ExactQuantilesSpec) so the choice is pure plan routing — the same
    * input-sized discipline as the streaming state-store flip. */
  val SmallInputBytes: Long = 256L << 20

  /** Input-size-routed entry point: `inputBytes` is the source's on-disk
    * parquet size (a cheap, layout-independent proxy for the distinct-value
    * buffer the built-in would build). */
  def byGroupAuto(df: DataFrame, groupCol: String, valueCol: String,
                  qs: Seq[(String, Double)], inputBytes: Long): DataFrame =
    if (inputBytes <= SmallInputBytes) {
      val aggs = qs.map { case (name, q) =>
        percentile(col(valueCol), lit(q)).as(name)
      }
      df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    } else byGroup(df, groupCol, valueCol, qs)

  /** Per-group exact interpolated quantiles of `valueCol` (a double column).
    * Returns one row per group: (groupCol, <name1>, <name2>, ...) with each
    * requested (name, q). NULL handling matches the built-in `percentile`
    * aggregate in BOTH directions: null values never count toward a
    * quantile position (ADVICE r11 #1), and a group whose values are ALL
    * null still emits a row with null quantiles (ADVICE r12 #1 — a
    * pre-filter would drop the group entirely while [[byGroupAuto]]'s
    * small-input route keeps it, so the size-routed plan choice would
    * change output shape). Achieved without an extra group-membership
    * pass: the null-value bucket stays in the distinct rollup but with
    * `count(valueCol) = 0`, so it contributes nothing to `__cum`/`__n`
    * (nulls sort first), can never satisfy a bracketing-position hit, yet
    * keeps the group alive through the final rollup — where an all-null
    * group's quantiles interpolate from null brackets to null, exactly the
    * built-in's answer. Both routes agree for any input. */
  def byGroup(df: DataFrame, groupCol: String, valueCol: String,
              qs: Seq[(String, Double)]): DataFrame = {
    val counts = df
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(col(valueCol)).as("__cnt"))
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
    val wAll = Window.partitionBy(groupCol)
    val cum = counts
      .withColumn("__cum", sum("__cnt").over(wCum))
      .withColumn("__n", sum("__cnt").over(wAll))
    // per quantile: pos = q·(n−1); this row holds 0-indexed positions
    // [cum − cnt, cum); project the bracketing values where they land
    def posOf(q: Double): Column = lit(q) * (col("__n") - 1L).cast("double")
    def hit(idx: Column): Column =
      (col("__cum") - col("__cnt") <= idx) && (idx < col("__cum"))
    val projected = qs.foldLeft(cum) { case (acc, (name, q)) =>
      val lower = floor(posOf(q)).cast("long")
      val higher = ceil(posOf(q)).cast("long")
      acc
        .withColumn(s"__lo_$name",
          when(hit(lower), col(valueCol)).otherwise(lit(null)))
        .withColumn(s"__hi_$name",
          when(hit(higher), col(valueCol)).otherwise(lit(null)))
    }
    val aggCols = qs.flatMap { case (name, _) =>
      Seq(min(s"__lo_$name").as(s"__lo_$name"), min(s"__hi_$name").as(s"__hi_$name"))
    } :+ max("__n").as("__n")
    val rolled = projected.groupBy(col(groupCol)).agg(aggCols.head, aggCols.tail: _*)
    val outCols = col(groupCol) +: qs.map { case (name, q) =>
      val pos = lit(q) * (col("__n") - 1L).cast("double")
      val lower = floor(pos).cast("long")
      val higher = ceil(pos).cast("long")
      // Percentile.getPercentile's exact spelling (operand order preserved)
      when(lower === higher, col(s"__lo_$name"))
        .otherwise(col(s"__lo_$name") * (higher.cast("double") - pos) +
          col(s"__hi_$name") * (pos - lower.cast("double")))
        .as(name)
    }
    rolled.select(outCols: _*)
  }
}
