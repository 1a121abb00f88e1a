package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys (100 TB discipline).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) which splits oversized post-shuffle partitions at
  * runtime. Salting is the *plan-level* fallback for the cases AQE can't
  * fix — e.g. a single key too hot for any split, or aggregations.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random-but-deterministic
    * salt derived from row content; the small side is exploded `saltFactor`
    * ways so every salted key still finds its match. Equivalent rows out,
    * hot keys spread over `saltFactor` reducers.
    *
    * Use when one build-side key would otherwise concentrate a reducer;
    * costs `saltFactor`× duplication of the small side (keep it small or
    * combine with broadcast — at which point you don't need salt at all).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val salts = explode(sequence(lit(0), lit(saltFactor - 1)))
    val saltedSmall = small.withColumn("__salt", salts)
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys: partial aggregate
    * on (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partials; explicit salting additionally spreads
    * the *reduce* side of a pathologically hot key. `aggs` must be
    * decomposable (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("cnt"))
}
