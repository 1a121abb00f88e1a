package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: per-action wall breakdown of the LM family's shared skeleton
  * at a bench tier — vocabulary scalar job, bigram-projection snapshot,
  * model+scoring pass — to size which fixed cost the family's seconds
  * live in (VERDICT r14 #5). */
object ProbeLmPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-lm", "32")
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lm] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { rd =>
      println(s"[lm] --- round $rd")
      val v = t("v distinct count") {
        docs.select(explode(split(col("text"), " ")).as("t")).distinct().count()
      }
      val bi0 = docs
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))")).as("p"))
        .select(col("doc_id"),
          col("p").getField("0").as("w1"),
          col("p").getField("1").as("w2"))
      val bi = t("snap(bi0)") { graft.util.Snapshots.snap(bi0) }
      val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
      val model = c2.join(c1, "w1")
        .select(col("w1"), col("w2"),
          round(-log((col("c2") + 1).cast("double") / (col("c1") + lit(v)).cast("double"))
            * 1e6, 0).cast("long").as("nll"))
      t("model+score+rollup count") {
        bi.join(model, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_micro"))
          .withColumn("avg_micro", expr("nll_micro div n_bigrams"))
          .count()
      }
      t("bi0 recompute (no snap)") { bi0.write.format("noop").mode("overwrite").save() }
      t("full q_ngram_lm (declared)") {
        graft.queries.CorpusQueries.ngramLm(spark, sfDir).count()
      }
      t("full q_ppl_buckets") {
        graft.queries.SelectionQueries.pplBuckets(spark, sfDir).count()
      }
      graft.util.SessionHygiene.scrub(spark, gc = true)
    }
    spark.stop()
  }
}
