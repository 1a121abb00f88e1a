package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Throwaway diagnostic (round 6): residual IVFADC plumbing + ADC fidelity. */
object ProbeMemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.build("probe-res", "8")
    val emb = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] corpus size = ${emb.count()}")
    val refined = Similarity.kmeansCentroidsFixedPoint(emb, numCentroids = 16, iters = 2)
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5, centroidsOverride = Some(refined)))
    val resAll = pairs(Similarity.ivfAdcResidualTopK(emb, queries, k = 5, rerank = 1000000,
      centroidsOverride = Some(refined)))
    println(s"[probe] exhaustive-rerank residual == plain IVF: ${resAll == ivf}")
    val rawAll = pairs(Similarity.ivfAdcTopK(emb, queries, k = 5, rerank = 1000000,
      centroidsOverride = Some(refined)))
    println(s"[probe] exhaustive-rerank raw == plain IVF: ${rawAll == ivf}")
    // survivor fidelity at rerank=16: how many of plain-IVF's top-5 survive ADC?
    for (rr <- Seq(8, 16, 32)) {
      val res = pairs(Similarity.ivfAdcResidualTopK(emb, queries, k = 5, rerank = rr,
        centroidsOverride = Some(refined)))
      val raw = pairs(Similarity.ivfAdcTopK(emb, queries, k = 5, rerank = rr,
        centroidsOverride = Some(refined)))
      println(s"[probe] rerank=$rr overlap-with-IVF: raw=${(raw intersect ivf).size} res=${(res intersect ivf).size} of ${ivf.size}")
    }
    spark.stop()
  }
}
