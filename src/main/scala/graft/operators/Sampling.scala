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

  /** Deterministic MIXTURE sampler with epoch upsampling — the data-recipe
    * step of a training run (cf. the published Pile / LLaMA corpus
    * recipes): given per-group target weights (per-mille) and a global row
    * `budget`, each group g with `avail_g` rows and target
    * `t_g = budget·w_g/1000` contributes
    *
    *   - every row repeated `⌊t_g / avail_g⌋` times (full epochs — the
    *     UPSAMPLING case: a high-weight minority source is replicated), plus
    *   - the affine-permutation-selected `≈ t_g mod avail_g` remainder rows
    *     once more (the same engine-portable integer arithmetic as the
    *     stratified sampler: bucket = ((id mod p)·15485863 + 17 mod p)
    *     mod 10⁴, kept while bucket < rate — counts are rate-exact to
    *     1/10⁴, the scale-true contract; an exact-count variant would need
    *     a per-group rank over data-sized groups).
    *
    * Output rows carry `epoch` (0-based repetition index), making the
    * repetition explicit for downstream shuffling/packing. Downsampling is
    * the degenerate case (0 full epochs + remainder selection).
    *
    * Scale shape: ONE catalog-bounded aggregate (group → avail, collected
    * to the driver like the IVF centroid tables) and then a map-only
    * filter + bounded row-local replication — no data shuffle at all; the
    * explode is ≤ ⌈t_g/avail_g⌉ per row. Deterministic under any layout
    * (pure function of id), so it is oracle-checkable value-for-value. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    weightsPerMille: Map[String, Long], defaultPerMille: Long,
                    budget: Long): DataFrame = {
    val M = 2147483647L
    val avail = df.groupBy(groupCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def target(g: String) = budget * weightsPerMille.getOrElse(g, defaultPerMille) / 1000L
    val epochsMap = avail.map { case (g, a) => g -> target(g) / a }
    val remRateMap = avail.map { case (g, a) => g -> (target(g) % a) * 10000L / a }
    if (avail.isEmpty) return df.withColumn("epoch", lit(0L)).limit(0)
    val bp = pmod(pmod(col(idCol), lit(M)) * lit(15485863L) + lit(17L), lit(M)) % 10000L
    val n = element_at(typedlit(epochsMap), col(groupCol)) +
      when(bp < element_at(typedlit(remRateMap), col(groupCol)), 1L).otherwise(0L)
    df.withColumn("epoch", explode(
      when(n > 0, sequence(lit(0L), n - 1)).otherwise(array().cast("array<bigint>"))))
  }
}
