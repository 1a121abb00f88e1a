package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics invariants for the product-analytics family beyond the DuckDB
  * hash gate. */
class AnalyticsQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def eventsFixture(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_fixture").toString
    rows.zipWithIndex
      .map { case ((uid, tpe, ts), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(ts), uid, tpe, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: strict ordering — click before first view does not convert") {
    val dir = eventsFixture(Seq(
      // user 1 converts fully: view -> click -> purchase
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:20:00"),
      // user 2: click BEFORE the first view — must not reach stage 2
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      // user 3: view then purchase but NO click — must not reach stage 3
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "purchase", "2024-01-01 09:00:00")))
    val rows = AnalyticsQueries.funnel(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("1_view") == ((3L, 0L)))
    assert(rows("2_click") == ((1L, 5L * 60 * 1000000)))
    assert(rows("3_purchase") == ((1L, 20L * 60 * 1000000)))
  }

  test("retention: offsets count whole weeks from the Monday-truncated signup week") {
    val dir = eventsFixture(Seq(
      // signup Wed Jan 3 2024 -> cohort week Mon Jan 1
      (1L, "signup", "2024-01-03 12:00:00"),
      // activity Sun Jan 7 = offset 0; Mon Jan 8 = offset 1
      (1L, "view", "2024-01-07 23:00:00"),
      (1L, "click", "2024-01-08 01:00:00"),
      // pre-signup-week activity is excluded
      (1L, "view", "2023-12-25 10:00:00")))
    val rows = AnalyticsQueries.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map(
      ("2024-01-01", 0L) -> 1L,
      ("2024-01-01", 1L) -> 1L))
  }

  test("profile: single-pass plan (one parquet scan) and exact stats on sf") {
    val df = AnalyticsQueries.profileOrders(spark, sf)
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"profile must scan orders exactly once, saw $scans scans")
    val rows = df.collect()
    assert(rows.length == 4)
    val ok = rows.find(_.getString(0) == "o_orderkey").get
    val nRows = ok.getLong(1)
    assert(ok.getLong(2) == 0L)            // no null keys
    assert(ok.getLong(3) == nRows)         // keys distinct
  }
}
