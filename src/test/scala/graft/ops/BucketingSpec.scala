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

  test("cell-bucketed IVF layout: repeated ANN batches join with no Exchange") {
    import graft.operators.Similarity
    // the amortized-IVF production shape end-to-end: assign once, WRITE
    // bucketed by cell; each later query batch (probes exploded to their
    // nprobe cells, bucketed the same way) joins with zero shuffle on
    // either side — at 100 TB this is what makes per-batch ANN cost
    // independent of corpus layout work
    spark.sql("DROP TABLE IF EXISTS ivf_assigned_b")
    spark.sql("DROP TABLE IF EXISTS ivf_probes_b")
    val emb = Tables.embeddings(spark, sf)
    val centroids = emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cell_id"), Similarity.toDouble(col("embedding")).as("centroid"))
    val assigned = Similarity.assignCells(emb, centroids)
      .select(col("cell"), col("candidate_id"), col("cn"))
    Bucketing.writeBucketed(assigned, "ivf_assigned_b", Seq("cell"), numBuckets = 4)
    // stand-in probe batch: every corpus vector probing its own cell
    val probes = Similarity.assignCells(emb.limit(256), centroids)
      .select(col("cell"), col("candidate_id").as("query_id"))
    Bucketing.writeBucketed(probes, "ivf_probes_b", Seq("cell"), numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "ivf_assigned_b", "ivf_probes_b", "cell")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"cell-bucketed ANN join still shuffles:\n$plan")
      assert(joined.count() > 0)
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
