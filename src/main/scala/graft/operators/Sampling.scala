package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed sampling for training-data pipelines.
  *
  * `df.sample(fraction, seed)` is only reproducible for a fixed partitioning
  * — a repartitioned rerun yields a different sample. Bottom-k-by-hash makes
  * the sample a pure function of row *content*: hash each row's key with a
  * seeded xxhash64 and keep the k smallest hashes per group. Uniform without
  * replacement, mergeable (min-k of a union = min-k of min-ks — the same
  * property KMV sketches exploit), and stable under any layout.
  */
object Sampling {

  /** k rows per group, chosen by seeded content hash. `uniqueCol` must be a
    * row-unique expression (it is both the hashed identity and the
    * tiebreak). One shuffle on the group key. */
  def bottomKByHash(df: DataFrame, groupCols: Seq[String], uniqueCol: Column,
                    k: Int, seed: Int = 42): DataFrame = {
    val h = xxhash64(lit(seed), uniqueCol)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc, uniqueCol.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Content-hash Bernoulli sample: keep rows whose seeded hash falls under
    * `fraction` of the hash space. Reproducible under any partitioning;
    * no shuffle at all (pure filter, pushes into the scan pipeline). */
  def bernoulliByHash(df: DataFrame, uniqueCol: Column, fraction: Double,
                      seed: Int = 42): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of range")
    val bound = (fraction * Long.MaxValue).toLong
    df.filter(abs(xxhash64(lit(seed), uniqueCol)) < bound)
  }
}
