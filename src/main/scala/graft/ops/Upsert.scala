package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE-INTO semantics (update-matched + insert-unmatched) — the
  * operation the reference's warehouse tier runs as Snowflake `MERGE`, and
  * the batch twin of the streaming last-writer-wins upsert sink.
  *
  * Shape: one full-outer join on the key; a match flag (not `coalesce`, so
  * a source row may legitimately update a column TO null) picks the source
  * side where matched, the target side where unmatched, and source-only
  * rows insert. One shuffle on the key (or zero if both sides are bucketed
  * on it); no windows, no state.
  */
object Upsert {

  /** `target` merged with `source` (same schema): source rows replace
    * matching target rows and append otherwise. Column set = target's. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    require(source.columns.toSeq == cols,
      s"source schema ${source.columns.toSeq} must match target $cols")
    val t = cols.foldLeft(target) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"__t_$c")
    }
    val s = cols.foldLeft(source) { (df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"__s_$c")
    }.withColumn("__from_src", lit(true))
    t.join(s, keys, "full_outer")
      .select(cols.map { c =>
        if (keys.contains(c)) col(c)
        else when(col("__from_src").isNotNull, col(s"__s_$c"))
          .otherwise(col(s"__t_$c")).as(c)
      }: _*)
  }
}
