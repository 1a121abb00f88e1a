package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crafted-session truth table + plan shape for the sessionize operator. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val ev = {
    import spark.implicits._
    Seq(
      // user 1: two sessions split by a 2-hour gap
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:10:00")),
      (3L, 1L, ts("2024-01-01 12:30:00")),
      // user 2: one session, events exactly at the 30-min boundary (gap is
      // strictly-greater, so 1800s apart stays in-session)
      (4L, 2L, ts("2024-01-01 09:00:00")),
      (5L, 2L, ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "ts")
  }

  test("gap splits sessions; boundary gap does not") {
    val got = Sessionize.sessionize(ev, "user_id", "ts", 1800L, "event_id")
      .select("event_id", "session_index")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("session stats: counts and spans per session") {
    val got = Sessionize.sessionStats(ev, "user_id", "ts", 1800L, "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      (1L, 1L) -> (2L, 600L),
      (1L, 2L) -> (1L, 0L),
      (2L, 1L) -> (2L, 1800L)))
  }

  test("both window passes share one Exchange (single shuffle operator)") {
    val plan = Sessionize.sessionize(ev, "user_id", "ts", 1800L, "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"sessionize must partition once:\n$plan")
  }

  test("range join matches only the in-window pairs") {
    import spark.implicits._
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("user_id", "p_id", "p_ts")
    val r = Seq(
      (1L, 20L, ts("2024-01-01 09:30:00")),  // in window
      (1L, 21L, ts("2024-01-01 08:30:00")),  // too old
      (1L, 22L, ts("2024-01-01 10:30:00")),  // after the purchase
      (2L, 23L, ts("2024-01-01 09:30:00"))   // other user
    ).toDF("user_id", "s_id", "s_ts")
    val got = Sessionize.rangeJoin(l, r, "user_id", "p_ts", "s_ts", 3600L)
      .select("p_id", "s_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((10L, 20L)))
  }
}
