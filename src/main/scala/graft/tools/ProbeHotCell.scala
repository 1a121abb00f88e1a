// Lives under tools/ with the other dev probes, but sits inside the
// operators package to reach the private[operators] pair-stage internals
// it measures (the spec does the same from the test tree).
package graft.operators.tools

import org.apache.spark.sql.functions._

import graft.operators.{PairCandidates, Similarity}

/** Dev probe for the hot-cell guard at SCALE (VERDICT r8 #2 done-criterion's
  * measured row — SimilaritySpec pins the semantics on 1 000 vectors; this
  * measures the candidate-volume and wall-time shape on a few hundred×
  * larger degenerate corpus): `hotFrac` of `n` vectors share one dominant
  * direction with small diverse jitters (NOT exact clones — the collapse
  * cannot absorb them; the low-diversity-corpus hazard the guard exists
  * for), the rest spread over distinct axes, and a handcrafted 2-cell
  * quantizer concentrates everything in cell 0. Prints candidate counts and
  * wall seconds for the unguarded (pop²) and guarded (~pop·√pop·nprobe)
  * pair stages.
  *
  * Usage: graft_run.sh graft.tools.ProbeHotCell [n] [hotFrac]
  */
object ProbeHotCell {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.9
    val spark = graft.util.Sessions.build("graft-probe-hotcell",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    import spark.implicits._
    val dim = 16
    val hot = (n * hotFrac).toInt
    val vecs: Seq[(Long, Array[Double])] = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      if (i < hot) Array(1.0) ++ Array.fill(dim - 1)(0.01 * r.nextDouble())
      else Array.tabulate(dim)(j => if (j == 1 + i % (dim - 1)) 1.0 else 0.0)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val withNorms = vecs.toDF("id", "v").repartition(32)
      .withColumn("vn", Similarity.l2Norm(col("v")))
      .persist()
    withNorms.count()
    val cells = Seq(
      (0L, 1.0 +: Seq.fill(dim - 1)(0.0), 1.0),
      (1L, 0.0 +: 1.0 +: Seq.fill(dim - 2)(0.0), 1.0))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    PairCandidates.invalidateStats()
    val (g, gs) = time(Similarity.repPairCandidates(
      withNorms, cells, nprobe = 2).count())
    PairCandidates.invalidateStats()
    val (u, us) = time(Similarity.repPairCandidates(
      withNorms, cells, nprobe = 2, hotBound = Long.MaxValue).count())
    println(f"[hotcell] n=$n hot=$hot unguarded=$u (${us}%.1f s) " +
      f"guarded=$g (${gs}%.1f s) ratio=${u.toDouble / g}%.1f")
    spark.stop()
  }
}
