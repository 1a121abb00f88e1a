// In the operators package (like ProbeHotCell) to reach the
// private[operators] collapsed/direct formulations it times.
package graft.operators.tools

import org.apache.spark.sql.functions._

import graft.operators.{PairCandidates, Similarity}

/** Dev probe: stage-level wall times for q_embed_neardup's machinery at a
  * tier — the clone-amplification gate (the aggregate the dispatch
  * actually runs — ADVICE r9: this used to time the retired dupFactor
  * probe, so regression attribution landed on a stage the query never
  * executes), the collapsed formulation, and the direct formulation.
  *
  * Usage: graft_run.sh graft.tools.ProbeEmbedPath <sfDir>
  */
object ProbeEmbedPath {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-embedpath",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = graft.util.Tables.embeddings(spark, d)
    val n = emb.count()
    val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[embedpath] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val keyed = emb.select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("v"))
    PairCandidates.invalidateStats()
    time("amp gate (cold)") {
      PairCandidates.shouldCollapse(keyed.select(Similarity.probeKey(col("v")).as("k")))
    }
    time("amp gate (memoized)") {
      PairCandidates.shouldCollapse(keyed.select(Similarity.probeKey(col("v")).as("k")))
    }
    PairCandidates.invalidateStats()
    time("dispatched COLD (probe + path)") {
      Similarity.cosineNearDuplicates(emb, 0.4, c, 2).count()
    }
    time("dispatched warm") {
      Similarity.cosineNearDuplicates(emb, 0.4, c, 2).count()
    }
    time("collapsed formulation") {
      Similarity.cosineNearDuplicatesCollapsed(emb, 0.4, c, 2).count()
    }
    spark.stop()
  }
}
