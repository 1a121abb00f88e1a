package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the BPE trainer's wall-vs-K cost curve (VERDICT r13 #3 —
  * the exact fitter pays one driver round trip per merge, so a
  * production 32k-merge vocabulary is 32k Spark jobs; this measures the
  * per-merge cost at growing K for the EXACT loop and the speedup the
  * disjoint-BATCHED loop buys at the same K).
  *
  * Fits past merge 31 use the private-use-area sentinel
  * ([[graft.queries.TextQueries.puaSentinel]]): chr(32) is the space the
  * corpus splits on and printable bytes collide with real text.
  *
  * Usage: runMain graft.tools.ProbeBpeK <sfDir> [maxK]
  * Prints one line per (mode, K): wall seconds, merges found, passes.
  */
object ProbeBpeK {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val maxK = if (args.length > 1) args(1).toInt else 64
    val spark = graft.util.Sessions.build("graft-probe-bpek",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val vocab = graft.util.Snapshots.snap(
      graft.util.Tables.documents(spark, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("word_cnt"))
        .orderBy(col("word_cnt").desc, col("w")).limit(65536))
    println(s"[bpek] vocab_words=${vocab.count()}")

    def run(label: String, k: Int)(fit: => Seq[(Long, String, Long)]): Unit = {
      val p0 = graft.queries.TextQueries.bpeBatchPassCount.get()
      val t0 = System.nanoTime()
      val merges = fit
      val sec = (System.nanoTime() - t0) / 1e9
      val passes = graft.queries.TextQueries.bpeBatchPassCount.get() - p0
      println(String.format(java.util.Locale.ROOT,
        "[bpek] mode=%s K=%d sec=%.2f merges=%d passes=%d sec_per_merge=%.3f",
        label, Int.box(k), Double.box(sec), Int.box(merges.length),
        Long.box(if (label == "exact") merges.length.toLong else passes),
        Double.box(sec / math.max(1, merges.length))))
    }

    Seq(8, 16, 32, 64).filter(_ <= maxK).foreach { k =>
      run("exact", k)(graft.queries.TextQueries.bpeFitWords(
        vocab, k, sentinelOf = graft.queries.TextQueries.puaSentinel))
    }
    Seq(16, 64).filter(_ <= maxK).foreach { k =>
      run("batched16", k)(graft.queries.TextQueries.bpeFitWordsBatched(
        vocab, k, batch = 16, sentinelOf = graft.queries.TextQueries.puaSentinel))
    }
    spark.stop()
  }
}
