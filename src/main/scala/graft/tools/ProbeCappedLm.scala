package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the capped-vocabulary LM chain
  * ([[graft.queries.CorpusQueries.ngramLmScoresCapped]]) on a tier —
  * attribution for the decade-tier wall (SCALING.md r12): vocab fit
  * (corpus word count + top-K), bigram id-mapping snapshot, model build,
  * scoring join + per-doc rollup.
  *
  * Usage: runMain graft.tools.ProbeCappedLm <sfDir>
  */
object ProbeCappedLm {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = graft.util.Sessions.build("graft-probe-cappedlm",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val k = 65536
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(String.format(java.util.Locale.ROOT, "[cappedlm] %s sec=%.2f",
        label, Double.box((System.nanoTime() - t0) / 1e9)))
      r
    }
    val docs = graft.util.Tables.documents(spark, d)
    val vocab = timed("vocab_fit_topk") {
      val v = graft.util.Snapshots.snap(
        docs.select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(k)
          .select("w"))
      v.count()
      v
    }
    val vocabIds = vocab.withColumn("wid",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("w")))
    // the zipped-slice spelling (mirrors ngramLmScoresCapped post-r12)
    val bi0 = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))")).as("p"))
      .select(col("doc_id"),
        col("p").getField("0").as("w1"),
        col("p").getField("1").as("w2"))
    val v1 = broadcast(vocabIds.select(col("w").as("w1"), col("wid").as("id1")))
    val v2 = broadcast(vocabIds.select(col("w").as("w2"), col("wid").as("id2")))
    val bi = timed("bigram_map_snapshot") {
      val b = graft.util.Snapshots.snap(
        bi0.join(v1, Seq("w1"), "left").join(v2, Seq("w2"), "left")
          .select(col("doc_id"),
            coalesce(col("id1"), lit(0)).as("id1"),
            coalesce(col("id2"), lit(0)).as("id2")))
      b.count()
      b
    }
    val model = timed("model_build") {
      val c2 = bi.groupBy("id1", "id2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("id1").agg(sum("c2").as("c1"))
      val m = graft.util.Snapshots.snap(c2.join(c1, "id1")
        .select(col("id1"), col("id2"),
          round(-log((col("c2") + 1).cast("double") / (col("c1") + lit(65537L)).cast("double"))
            * 1e6, 0).cast("long").as("nll")))
      m.count()
      m
    }
    timed("score_join_rollup") {
      bi.join(model, Seq("id1", "id2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_micro"))
        .count()
    }
    spark.stop()
  }
}
