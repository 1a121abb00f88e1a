package graft.operators.tools
import org.apache.spark.sql.functions._
import graft.operators.{Components, PairCandidates, Similarity}
/** Dev probe: stage-level wall for q_semdedup at a tier (VERDICT r10 #3). */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = graft.util.Sessions.build("probe-semdedup", sys.env.getOrElse("SPARK_GRAFT_CPUS","32"))
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[semdedup] $l%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s"); a
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val emb = graft.util.Tables.embeddings(s, d)
      val n = time("emb.count")(emb.count())
      val c = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
      val edges = time("edges construct")(
        Similarity.cosineNearDupEdges(emb, threshold = 0.4, numCentroids = c, nprobe = 2))
      val ne = time("edges count")(edges.count())
      println(s"[semdedup] n=$n edges=$ne localRoute=${ne <= Components.LocalClosureBound}")
      val comp = time("components")(
        Components.clusters(emb.select("vec_id"), "vec_id", edges, "id_a", "id_b"))
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("n_members"))
      time("final count")(
        comp.join(sizes, "component")
          .select(col("vec_id"), col("component"), col("n_members"),
            (col("vec_id") === col("component")).cast("int").as("is_kept"))
          .orderBy("vec_id").count())
    }
    s.stop()
  }
}
