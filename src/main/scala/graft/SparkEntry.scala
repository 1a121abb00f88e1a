package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full named-operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data extensions); `oracleSql`
  * holds the DuckDB-equivalent SQL for every oracle-checkable entry.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-schema join + aggregate (SURVEY §2.3 J2). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ ScalarQueries.all ++ WindowQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ ExtendedRelationalQueries.all ++
      TpchQueries.all ++ FunctionQueries.all ++ PipelineQueries.all ++
      CorpusQueries.all ++ StreamingQueries.all ++ SelectionQueries.all ++
      AnalyticsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ ScalarQueries.oracle ++ WindowQueries.oracle ++
      TextQueries.oracle ++ SimilarityQueries.oracle ++ ExtendedRelationalQueries.oracle ++
      TpchQueries.oracle ++ FunctionQueries.oracle ++ PipelineQueries.oracle ++
      CorpusQueries.oracle ++ StreamingQueries.oracle ++ SelectionQueries.oracle ++
      AnalyticsQueries.oracle
}
