package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.PairCandidates

/** Dev tool: print each cost-gated similarity family's probe statistics and
  * the collapse-vs-direct decision they imply at a tier (VERDICT r8 #1
  * done-criterion): clone amplification Σg²/N for the unblocked embedding
  * gate, and the blocked candidate-volume model (Σ P_b², Σ D_b², ratio) for
  * jaccard / levenshtein. Keys are the serialization-free xxhash64 probe
  * keys the gates themselves use.
  *
  * Usage: graft_run.sh graft.tools.ProbeDupFactor <sfDir>
  */
object ProbeDupFactor {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-dup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    val emb = graft.util.Tables.embeddings(spark, d)
    val ek = emb.select(col("embedding").cast("array<double>").as("v"))
      .select(xxhash64(struct(col("v"))).as("k"))
    val er = ek.groupBy("k").agg(count(lit(1)).as("g"))
      .agg(sum(col("g") * col("g")), sum(col("g"))).head()
    val amp = er.getLong(0).toDouble / math.max(er.getLong(1), 1L)
    println(f"[dupfactor] embeddings(v)     amp=$amp%12.3f -> ${if (PairCandidates.shouldCollapse(ek)) "collapse" else "direct"}")

    val docs = graft.util.Tables.documents(spark, d)
    def blocked(name: String, keyed: org.apache.spark.sql.DataFrame): Unit = {
      val r = keyed.groupBy("block", "k").agg(count(lit(1)).as("g"))
        .groupBy("block").agg(sum(col("g")).as("p"), count(lit(1)).as("dd"))
        .agg(sum(col("p").cast("double") * col("p")),
          sum(col("dd").cast("double") * col("dd"))).head()
      val (sp2, sd2) = (r.getDouble(0), math.max(r.getDouble(1), 1d))
      println(f"[dupfactor] $name%-17s sp2=$sp2%1.3e sd2=$sd2%1.3e ratio=${sp2 / sd2}%7.3f -> " +
        (if (PairCandidates.shouldCollapseBlocked(keyed)) "collapse" else "direct"))
    }
    blocked("jaccard(block,w)", docs.select(
      concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long")).as("block"),
      array_sort(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .select(col("block"), xxhash64(struct(col("block"), col("w"))).as("k")))
    blocked("lev(block,s)", docs.select(
      concat_ws("|", col("lang"), floor(col("n_chars") / 10).cast("long")).as("block"),
      substring(col("text"), 1, 40).as("s"))
      .select(col("block"), xxhash64(struct(col("block"), col("s"))).as("k")))
    spark.stop()
  }
}
