package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of join semantics: latest right row at-or-before each left row. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at or before the left timestamp, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"),
      (3L, ts("2024-01-01 10:00:10"), "t4")  // key with no quotes at all
    ).toDF("user_id", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:00:30"), 102.0), // after both trades — never used
      (2L, ts("2024-01-01 10:00:10"), 200.0)  // equal ts — visible (<= semantics)
    ).toDF("user_id", "qts", "price")

    val out = AsOf.asofJoin(trades, quotes, "user_id", "ts", "qts", Seq("price"))
      .select("trade", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("t1") == 100.0) // only the 10:00:00 quote precedes 10:00:05
    assert(out("t2") == 101.0) // 10:00:10 is latest at-or-before 10:00:20
    assert(out("t3") == 200.0) // equal timestamp visible
    assert(out(("t4")) == null) // no quote for key 3 -> left join null
  }

  test("right-side nulls do not tear rows (struct payload is atomic)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:10"), "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option("a"), Option(1.0)),
      (1L, ts("2024-01-01 10:00:05"), None: Option[String], Option(2.0))
    ).toDF("k", "rts", "s", "v")
    val out = AsOf.asofJoin(left, right, "k", "ts", "rts", Seq("s", "v")).head()
    // latest right row wins as a unit: (null, 2.0), NOT ("a", 2.0)
    assert(out.isNullAt(out.fieldIndex("s")))
    assert(out.getDouble(out.fieldIndex("v")) == 2.0)
  }

  test("plan shuffles once on the key (no join explosion)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:10"), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "rts", "v")
    val plan = AsOf.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"composed as-of must not plan a join:\n$plan")
  }
}
