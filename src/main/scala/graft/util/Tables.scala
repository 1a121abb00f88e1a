package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these helpers
  * centralize the parquet path convention so queries stay one-liners.
  * Scans are plain `spark.read.parquet` — column pruning + predicate pushdown
  * reach the parquet footer automatically (verified via `.explain`, see
  * `graft.tools.ExplainAll`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize `events.ts` to a session-zone TimestampType whatever the
    * parquet physical type of the tier at hand:
    *
    *   - TIMESTAMP(NANOS) (early driver tiers): Spark 4 only reads it as
    *     LongType (`spark.sql.legacy.parquet.nanosAsLong=true`, set in every
    *     session builder in this repo) — convert with integer division (a
    *     double division would lose precision above 2^53 ns).
    *   - timestamp[us] without UTC adjustment (current driver tiers): Spark 4
    *     infers TIMESTAMP_NTZ, which refuses numeric casts and diverges from
    *     TimestampType in window-range arithmetic — reinterpret the wall
    *     clock in the session zone (UTC everywhere in this repo, so the
    *     instant is unchanged and `epoch_us // 1000000` in the DuckDB oracle
    *     still matches `cast(ts as long)` here).
    *   - TimestampType (tools/ScaleUp derived tiers): pass through. */
  def normalizeEventTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, org.apache.spark.sql.functions.col(c)
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = normalizeEventTs(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** All tables with their typed readers (events gets the ns→µs timestamp
    * restoration) — use this, not raw `table`, when registering views. */
  def all(s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "region" -> region(s, d), "nation" -> nation(s, d),
    "customer" -> customer(s, d), "supplier" -> supplier(s, d),
    "part" -> part(s, d), "orders" -> orders(s, d),
    "lineitem" -> lineitem(s, d), "events" -> events(s, d),
    "documents" -> documents(s, d), "embeddings" -> embeddings(s, d))
}
