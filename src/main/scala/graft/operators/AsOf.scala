package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key. Spark has no native operator for
  * this; per the custom-operator preference order (compose > Expression >
  * LogicalPlan+Strategy, SURVEY §7.3 / builder brief) it composes cleanly
  * from union + window, so no custom SparkPlan is justified:
  *
  *   tag left/right → unionByName → window per key ordered by
  *   (ts, right-first tiebreak) → last non-null right payload at or before
  *   each row → keep left rows.
  *
  * Cost: ONE shuffle on the key (same as any keyed join) + in-partition
  * sort; no range explosion, no per-row subquery. At 100 TB both sides
  * hash-partition by key and the window streams — this is the plan a
  * native as-of SparkPlan would produce anyway.
  *
  * Ties (`rightTs == leftTs`): the right row sorts before the left row, so
  * an equal-timestamp right row IS visible to the left row (<= semantics,
  * matching DuckDB's ASOF JOIN `ON l.ts >= r.ts`).
  */
object AsOf {

  /** @param left       rows to enrich
    * @param right      lookup rows (e.g. quotes, state changes)
    * @param key        equi-join key column (same name both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightCols  right columns to carry (must not collide with left)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side: 0 sorts before 1 → right rows at equal ts win visibility
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // all carried right columns ride in ONE struct so the window carry is
    // atomic — independent per-column last() would tear rows if the right
    // side itself contains nulls; unionByName(allowMissingColumns) fills
    // the struct with NULL on left rows and the left columns with NULL on
    // right rows
    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightCols.map(col): _*))
      .select(Seq(key, "__ts", "__side", "__payload").map(col): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__last.$c").as(c)): _*)
  }
}
