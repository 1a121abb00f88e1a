package graft.expr

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Extension-surface tests: SQL-callable to_24h + the FoldTo24Hour rule.
  * Needs its own session: extensions bind at session build, and getOrCreate
  * would silently return the extension-less shared TestSpark session — so we
  * clear the active/default session first (the SparkContext is reused) and
  * restore it afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
    s
  }

  test("to_24h is callable from SQL") {
    val got = spark.sql("SELECT to_24h('01/15/2023 02:30:00 PM') AS t").head().getString(0)
    assert(got == "01/15/2023 14:30:00")
  }

  test("sorted_intersect_size is callable from SQL") {
    val got = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .head().getInt(0)
    assert(got == 2)
  }

  test("normalize_text is callable from SQL") {
    // the combining mark and BEL ride inside the SQL literal via Scala
    // escapes (Spark SQL's chr() truncates code points above 255)
    val got = spark.sql(
      "SELECT normalize_text('e\u0301  a\u0007b  ') AS t")
      .head().getString(0)
    assert(got == "\u00E9 a b")
  }

  test("char_entropy is callable from SQL") {
    val got = spark.sql("SELECT char_entropy('aaaa') AS e").head().getDouble(0)
    assert(got == 0.0)
    val ab = spark.sql("SELECT char_entropy('ab') AS e").head().getDouble(0)
    assert(math.abs(ab - math.log(2)) < 1e-12)
  }

  test("ngram_cardinality is callable from SQL and requires a literal n") {
    val got = spark.sql("SELECT ngram_cardinality('abcabc', 3) AS n").head().getInt(0)
    assert(got == 3) // windows abc,bca,cab,abc -> 3 distinct
    val err = intercept[Exception] {
      spark.sql("SELECT ngram_cardinality('abc', length('x')) AS n").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null && err.getCause.getMessage.contains("integer literal"))
  }

  test("FoldTo24Hour constant-folds literal inputs at plan time") {
    val df = spark.sql("SELECT to_24h('01/15/2023 02:30:00 PM') AS t")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("01/15/2023 14:30:00"), s"not folded:\n$optimized")
    assert(!optimized.contains("to_24h"), s"expression survived folding:\n$optimized")
  }

  test("null literal folds to null") {
    val df = spark.sql("SELECT to_24h(CAST(NULL AS STRING)) AS t")
    assert(df.head().isNullAt(0))
  }

  test("SQL path agrees with the Column API on table data") {
    import spark.implicits._
    Seq("06/01/2024 03:10:00 PM", "garbage", "12/31/1999 12:00:00 AM")
      .toDF("raw").createOrReplaceTempView("raws")
    val viaSql = spark.sql("SELECT to_24h(raw) AS t FROM raws ORDER BY t")
      .collect().map(_.getString(0)).toSeq
    val viaApi = spark.table("raws")
      .select(To24Hour.to_24h(org.apache.spark.sql.functions.col("raw")).as("t"))
      .orderBy("t").collect().map(_.getString(0)).toSeq
    assert(viaSql == viaApi)
  }
}
