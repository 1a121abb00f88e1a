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

  test("planted skew: AQE splits the hot partition, salting spreads it at plan level") {
    import spark.implicits._
    // one hot key carrying 50k rows vs 100 cold keys of 10 rows
    val big = ((0 until 50000).map(i => ("hot", i)) ++
      (0 until 100).flatMap(k => (0 until 10).map(i => (s"cold_$k", i)))).toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 100).map(i => s"cold_$i")).map((_, 1)).toDF("k", "w")
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      // force a shuffle join and shrink AQE's skew thresholds so the test-
      // sized hot partition qualifies for a runtime split
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val joined = big.join(small, "k")
      joined.collect() // AQE re-plans during execution; read the final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark a skew split:\n$plan")
      // plan-level fallback: the salted join spreads the hot key over >1
      // reducer partition even where AQE is off (aggregations, single
      // too-hot key), while a plain shuffle join pins it to exactly one
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      // test data is tiny: AQE coalescing would merge the salted reducers
      // back together and mask the spread being asserted
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val plainParts = big.join(small, "k").filter($"k" === "hot")
        .select(spark_partition_id()).distinct().count()
      val saltedParts = Skew.saltedJoin(big, small, "k", saltFactor = 8)
        .filter($"k" === "hot")
        .select(spark_partition_id()).distinct().count()
      assert(plainParts == 1, s"plain join spread the key over $plainParts partitions")
      assert(saltedParts > 1, s"salted join did not spread the hot key ($saltedParts)")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      // force a shuffle join and drop the size gates so the test-sized
      // tables qualify — at 100 TB the defaults (10 GB probe side) do this
      // unprompted on exactly this shape: fact scan joined to a filtered
      // dimension too big to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = Tables.lineitem(spark, sf)
      val urgent = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
      // the filter must not change results, only prune probe-side rows early
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        li.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
      }
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == expected)
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
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
