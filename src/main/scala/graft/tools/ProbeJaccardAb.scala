// In the operators package to reach the private[operators] strategy
// formulations it A/Bs (the ProbeHotCell pattern).
package graft.operators.tools

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, PairCandidates}

/** Dev probe: A/B the jaccard collapse-vs-direct strategies at a tier with
  * the q_jaccard_pairs preparation (block = lang × n_chars/25), so the
  * cost gate's bound for the TEXT family rests on a measurement, not on
  * the embedding family's numbers.
  *
  * Usage: graft_run.sh graft.tools.ProbeJaccardAb <sfDir> [threshold]
  */
object ProbeJaccardAb {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val spark = graft.util.Sessions.build("graft-probe-jacab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = graft.util.Tables.documents(spark, d)
    val prepared0 = docs.select(col("doc_id").as("id"),
      concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")).as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[jacab] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $a")
      a
    }
    PairCandidates.invalidateStats()
    val snapped = time("snap(tokenized)") {
      val s0 = graft.util.Snapshots.snap(prepared0); s0.count(); s0
    }
    time("gate probe") {
      PairCandidates.shouldCollapseBlocked(
        snapped.select(col("block"), xxhash64(struct(col("block"), col("w"))).as("k")))
    }
    // alternate the strategies 3× each — single runs on a shared box are
    // order-sensitive (page cache, JIT): report the full sequence
    (1 to 3).foreach { i =>
      time(s"direct#$i") {
        Dedup.jaccardPairsDirect(snapped, threshold, 1024).count()
      }
      time(s"collapsed#$i") {
        Dedup.jaccardPairsCollapsed(snapped, threshold, 1024).count()
      }
    }
    spark.stop()
  }
}
