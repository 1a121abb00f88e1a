package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.PairCandidates

/** Dev-only stage profiler for the pair-candidate path (not part of the
  * shipped surface). */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-profile", "32")
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val prepared = docs.select(col("doc_id").as("id"),
      concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")).as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))

    time("prepare words")(prepared.count())
    time("max block size")(PairCandidates.maxBlockSize(prepared))
    time("prefix candidates")(
      PairCandidates.jaccardPrefixCandidates(prepared, 0.2).count())
    time("blocked candidates")(PairCandidates.blockAllPairs(prepared).count())
    time("jaccardPairs auto")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")), 0.2).count())
    time("jaccardPairs prefix")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")), 0.2,
        autoBlockBound = 1).count())

    val led = docs.select(col("doc_id").as("id"),
      substring(col("text"), 1, 40).as("s"),
      concat_ws("|", col("lang"), floor(col("n_chars") / 10).cast("long")).as("block"))
    // gram-size ablation: a [a-z0-9] bigram vocabulary is ~1.3k grams, so
    // big blocks collide at chance level and the equi-join output grows
    // ~quadratically; trigrams (46k vocab) cut collision odds ~36x while
    // the count bound stays lossless (40 - 3 + 1 - 10*3 = 8 > 0)
    time("lev qgram candidates q=2")(PairCandidates.editDistanceCandidates(led, 10, q = 2).count())
    time("lev qgram candidates q=3")(PairCandidates.editDistanceCandidates(led, 10, q = 3).count())
    time("jaccardPairs auto again")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")), 0.2).count())
    time("q_jaccard full query")(
      graft.queries.SimilarityQueries.jaccardTopPairs(spark, sfDir).count())
    time("q_jaccard full again")(
      graft.queries.SimilarityQueries.jaccardTopPairs(spark, sfDir).count())
    time("lev qgram candidates")(PairCandidates.editDistanceCandidates(led, 10).count())
    time("lev blocked candidates")(PairCandidates.blockAllPairs(led).count())
    time("q_levenshtein full")(
      graft.queries.SimilarityQueries.levenshteinPairs(spark, sfDir).count())
    time("q_levenshtein again")(
      graft.queries.SimilarityQueries.levenshteinPairs(spark, sfDir).count())
    spark.stop()
  }
}
