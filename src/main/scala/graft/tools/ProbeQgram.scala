package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.PairCandidates

/** Dev-only ablation: edit-distance candidate generation at q=2 vs q=3.
  *
  * Motivation (100× tier finding): over a [a-z0-9] alphabet the bigram
  * vocabulary is ~1.3k grams, so once blocks reach the thousands, two
  * random 40-char prefixes share a (g, occurrence) key at chance level and
  * the candidate equi-join's OUTPUT grows ~quadratically with block size —
  * the count filter prunes after the join, not before it. Trigrams (46k
  * vocabulary) cut the collision odds ~36× while the Gravano bound stays
  * lossless (len − q + 1 − d·q = 40 − 3 + 1 − 30 = 8 > 0 at the 40-char
  * prefix). The price: the short-string cutoff rises (d·q + q − 1: 21 →
  * 32 chars), sending more tiny strings to the bounded all-pairs path.
  *
  * Usage: runMain graft.tools.ProbeQgram <sfDir>
  */
object ProbeQgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-qgram",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.count()
    val led = docs.select(col("doc_id").as("id"),
      substring(col("text"), 1, 40).as("s"),
      concat_ws("|", col("lang"), floor(col("n_chars") / 10).cast("long")).as("block"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    Seq(2, 3).foreach { q =>
      time(s"candidates q=$q")(PairCandidates.editDistanceCandidates(led, 10, q = q).count())
    }
    spark.stop()
  }
}
