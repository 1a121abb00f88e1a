package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** Tests for the scale-path operators: distributed dense ids, salted joins,
  * salted aggregation. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("denseIds assigns 0..n-1 in sort-key order, independent of input layout") {
    val orders = Tables.orders(spark, sf)
    val ids = Ids.denseIds(orders, Seq("o_orderkey"))
    val collected = ids.select("o_orderkey", "row_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(collected.map(_._2).toSeq == (0L until collected.length).toSeq)
    // reproducible under different input partitioning
    val ids2 = Ids.denseIds(orders.repartition(7), Seq("o_orderkey"))
    assert(ids2.select("o_orderkey", "row_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == collected.toSeq)
  }

  test("denseIds matches the single-partition row_number variant on small data") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
    val windowed = orders.select(col("o_orderkey"),
      (row_number().over(Window.orderBy("o_orderkey")) - 1).cast("long").as("rn"))
    val dist = Ids.denseIds(orders, Seq("o_orderkey")).select("o_orderkey", "row_id")
    val joined = windowed.join(dist, "o_orderkey")
    assert(joined.filter(col("rn") =!= col("row_id")).count() == 0)
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", saltFactor = 4).count()
    assert(salted == plain)
  }

  test("saltedSumCount equals plain groupBy aggregation") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy("event_type")
      .agg(sum("value").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(ev.select("event_type", "value"), "event_type", "value")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
