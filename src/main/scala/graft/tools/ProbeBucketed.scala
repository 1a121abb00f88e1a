package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Bucketing

/** Dev-only demonstration that the bucketed layout removes the fact-fact
  * shuffle AT SCALE — the claim SCALING.md makes for repeated joins.
  *
  * The raw star join pays a SortMergeJoin with both sides exchanged every
  * run (67 s at the 1000× tier, shuffle spill). Bucketing lineitem and
  * orders on orderkey is a ONE-TIME cost; after it, every join on the key
  * plans SortMergeJoin with zero Exchange on either side — this probe
  * times both the layout write and the repeated-query payoff, and fails
  * loudly if an Exchange appears above either bucketed scan.
  *
  * Usage: runMain graft.tools.ProbeBucketed <sfDir> [numBuckets]
  */
object ProbeBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/tier100x")
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = graft.util.Sessions.build("graft-probe-bucketed",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.util.Tables
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(java.math.BigDecimal.ONE).cast(DecimalType(12, 2)) -
          col("l_discount").cast(DecimalType(12, 2)))).as("rev"))
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // fresh session = fresh in-memory catalog: stale warehouse dirs from a
    // previous probe run block saveAsTable — clear them first
    Seq("probe_li_b", "probe_o_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    time(s"bucketed write ($buckets)") {
      Bucketing.writeBucketed(li, "probe_li_b", Seq("l_orderkey"), buckets)
      Bucketing.writeBucketed(o, "probe_o_b", Seq("l_orderkey"), buckets)
    }
    def starFromBucketed() = {
      val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name", "n_regionkey")
      val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA").select("r_regionkey")
      Bucketing.bucketedJoin(spark, "probe_li_b", "probe_o_b", "l_orderkey")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum("rev").cast(DecimalType(18, 4)).cast("double").as("revenue"))
    }
    // the co-location contract: no Exchange between the bucketed scans and
    // their SortMergeJoin (the only exchange left is the tiny final agg)
    val plan = starFromBucketed().queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    require(joinIdx >= 0, s"expected a SortMergeJoin:\n$plan")
    val below = plan.substring(joinIdx)
    val exchangesBelowJoin = "(?<!Broadcast)Exchange".r.findAllIn(below).size
    println(s"[probe] exchanges below the fact join: $exchangesBelowJoin (0 = co-located)")
    require(exchangesBelowJoin == 0, s"bucketed join still exchanges:\n$plan")
    (1 to 3).foreach { i => time(s"bucketed star join run $i")(starFromBucketed().count()) }
    spark.stop()
  }
}
