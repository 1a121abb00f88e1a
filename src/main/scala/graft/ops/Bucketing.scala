package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical-layout operators for 100 TB scans: bucketed tables (co-located
  * joins — repeated joins/aggs on the bucket key skip their shuffle
  * entirely) and date-partitioned layouts (partition pruning — a filtered
  * scan touches only matching directories).
  *
  * Bucketing requires the table catalog (`saveAsTable`): bucket metadata
  * lives in the metastore, not the parquet files.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table. Joins/aggregations on
    * `keys` between tables bucketed the same way plan without Exchange.
    * With `path` set, the table is EXTERNAL at that location — callers that
    * rebuild per session point it at a unique temp dir so concurrent
    * sessions over the same data never race on a shared warehouse dir. */
  def writeBucketed(df: DataFrame, tableName: String, keys: Seq[String],
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  /** Write a directory layout partitioned by the given columns; filters on
    * them prune at the directory level (PartitionFilters in the scan). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Join two same-bucketed catalog tables on their bucket key — the plan
    * this produces (SortMergeJoin with NO Exchange on either side) is the
    * co-location contract callers rely on. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
