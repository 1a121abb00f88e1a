package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.Tables

/** Physical-layout tests: bucketed join without Exchange, partition-pruned
  * scans. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("same-bucketed tables join with no Exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_orderkey"), numBuckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b", Seq("o_orderkey"), numBuckets = 4)
    // with broadcast available the planner rightly skips bucketing on tiny
    // tables ("Bucketed: false (disabled by query planner)") — disable it so
    // the plan must rely on the bucket layout, as it would at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        Tables.lineitem(spark, sf).join(
          Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes directories on partition filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    Bucketing.writePartitioned(ev, dir, Seq("event_type"))
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in scan:\n$scan")
    assert(pruned.count() == ev.filter(col("event_type") === "purchase").count())
  }
}
