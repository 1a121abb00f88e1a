package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** CLI demo/driver for the dedup family over the documents table.
  * Usage: runMain graft.tools.RunDedup <sfDir>
  */
object RunDedup {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RunDedup <sfDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.Sessions.build("graft-dedup")
    try {
      val docs = graft.util.Tables.documents(spark, args(0))
      val total = docs.count()
      val exact = Dedup.exact(docs, Seq("text")).count()
      println(s"[dedup] docs: $total, after exact text dedup: $exact (${total - exact} removed)")
      val byFp = Dedup.exactByFingerprint(docs, "text").count()
      println(s"[dedup] after fingerprint dedup: $byFp")
      val minhashPairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.7)
      println(s"[dedup] minhash-LSH near-dup pairs (j>=0.7):")
      minhashPairs.orderBy(col("jaccard").desc, col("id_a")).show(10, truncate = false)
      val simhashPairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 6)
      println(s"[dedup] simhash near-dup pairs (hamming<=6): ${simhashPairs.count()}")
      println("[dedup] deterministic 3-per-lang sample (bottom-k by hash):")
      graft.operators.Sampling.bottomKByHash(docs, Seq("lang"), col("doc_id"), k = 3)
        .select("lang", "doc_id").orderBy("lang", "doc_id").show(truncate = false)
    } finally spark.stop()
  }
}
