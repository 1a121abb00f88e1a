package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: derive a larger benchmark tier from a driver-generated one by
  * replicating each table `copies`× with key columns shifted per copy, so
  * uniqueness and every foreign-key relationship survive (copy c of
  * lineitem joins copy c of orders/part/supplier, etc.). The fixed-size
  * dimension tables region/nation are NOT replicated — true to TPC-H,
  * they are constant at any scale factor, and the unshifted nationkey
  * references stay valid.
  *
  * `events.ts` is rewritten as a microsecond timestamp (the driver tiers
  * carry TIMESTAMP(NANOS), which Spark can only surface as long);
  * replicated events share timestamps, which is safe because every
  * order-sensitive query tie-breaks on the (shifted, unique) event_id.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val spark = graft.util.Sessions.build("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stride = 100000000L // larger than any key in the driver tiers
    val keyCols: Seq[(String, Seq[String])] = Seq(
      "region" -> Seq.empty,
      "nation" -> Seq.empty,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    keyCols.foreach { case (t, keys) =>
      val raw = spark.read.parquet(s"$src/$t.parquet")
      val base =
        if (t == "events") raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw
      val out = if (keys.isEmpty) base else
        (0 until copies).map { c =>
          keys.foldLeft(base)((d, k) => d.withColumn(k, col(k) + lit(c * stride)))
        }.reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
