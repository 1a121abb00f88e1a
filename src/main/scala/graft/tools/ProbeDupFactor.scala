package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.PairCandidates

/** Dev tool: print the dup-factor probe reading (and the collapse-vs-direct
  * decision it implies) for each cost-gated similarity family at a tier —
  * the r9 gate must route dup-ratio-≈1 tiers direct and clone-heavy derived
  * tiers through the collapse (VERDICT r8 #1 done-criterion).
  *
  * Usage: graft_run.sh graft.tools.ProbeDupFactor <sfDir>
  */
object ProbeDupFactor {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-dup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    def report(name: String, f: Double): Unit =
      println(f"[dupfactor] $name%-18s $f%8.3f -> ${if (f >= PairCandidates.collapseDupFactorBound) "collapse" else "direct"}")

    val emb = graft.util.Tables.embeddings(spark, d)
    report("embeddings(v)", PairCandidates.dupFactor(
      emb.select(col("embedding").cast("array<double>").as("v"))
        .select(md5(to_json(struct(col("v")))).as("k"))))

    val docs = graft.util.Tables.documents(spark, d)
    report("jaccard(block,w)", PairCandidates.dupFactor(
      docs.select(
        concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")).as("block"),
        array_sort(graft.functions.TextFunctions.words(col("text"))).as("w"))
        .select(md5(to_json(struct(col("block"), col("w")))).as("k"))))

    report("lev(block,s)", PairCandidates.dupFactor(
      docs.select(
        concat_ws("|", col("lang"), floor(col("n_chars") / 10).cast("long")).as("block"),
        substring(col("text"), 1, 40).as("s"))
        .select(md5(to_json(struct(col("block"), col("s")))).as("k"))))
    spark.stop()
  }
}
