package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** HLL sketch accuracy + mergeability on the events table. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("per-group estimates land within the HLL error envelope") {
    val ev = Tables.events(spark, sf)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.hllSketch(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      // lgK=12 → ~1.6% RSE; 5% is > 3 sigma
      assert(math.abs(est(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: est ${est(k)} vs exact $n")
    }
  }

  test("merged per-slice sketches equal the whole-data sketch") {
    val ev = Tables.events(spark, sf).withColumn("slice", col("event_id") % 4)
    val whole = Sketches.hllSketch(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.merge(
        Sketches.hllSketch(ev, Seq("event_type", "slice"), "user_id"),
        Seq("event_type"))
      .select(col("event_type"), Sketches.estimate(col("hll")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole) // HLL union is lossless over the same registers
  }
}
