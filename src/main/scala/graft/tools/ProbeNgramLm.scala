package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev A/B for VERDICT r7 #3: q_ngram_lm recomputes the bigram explode
  * three times (c2, c1, final scoring join). Map-only recompute is the
  * documented default, but at 100 TB three corpus scans vs one is real
  * money — this probe measures, at a given tier, (a) the declared
  * triple-recompute plan vs (b) persisting the (doc_id, w1, w2) projection
  * (tokens only, text projected away) across the three consumers.
  *
  * Usage: runMain graft.tools.ProbeNgramLm <sfDir>
  */
object ProbeNgramLm {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-ngramlm",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = String.format(java.util.Locale.ROOT, "%.1f",
        Double.box((System.nanoTime() - t0) / 1e9))
      println(s"[probe-ngramlm] $tag rows=$n sec=$sec")
    }

    timed("recompute") {
      graft.queries.CorpusQueries.ngramLm(spark, d).count()
    }
    graft.util.SessionHygiene.scrub(spark)

    timed("persist-bi") {
      val docs = graft.util.Tables.documents(spark, d)
      val v = docs.select(explode(split(col("text"), " ")).as("t")).distinct().count()
      val bi = docs
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("ws")) - 1)).as("i"), col("ws"))
        .select(col("doc_id"),
          element_at(col("ws"), col("i")).as("w1"),
          element_at(col("ws"), (col("i") + 1).cast("int")).as("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
        val model = c2.join(c1, "w1")
          .select(col("w1"), col("w2"),
            round(-log((col("c2") + 1).cast("double") / (col("c1") + lit(v)).cast("double"))
              * 1e6, 0).cast("long").as("nll"))
        bi.join(model, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_micro"))
          .withColumn("avg_micro", expr("nll_micro div n_bigrams"))
          .count()
      } finally bi.unpersist(blocking = false)
    }
    graft.util.SessionHygiene.scrub(spark)

    // the lifecycle-safe spelling of the persist win: RDD-backed blocks are
    // ContextCleaner-reclaimed once the caller drops the result, unlike a
    // CacheManager entry which pins until an explicit unpersist
    timed("localCheckpoint-bi") {
      graft.queries.CorpusQueries.ngramLm(spark, d).count()
    }
    spark.stop()
  }
}
