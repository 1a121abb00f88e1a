package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables._

/** Dev A/B (VERDICT r10 #1): old ×10-explode+distinct+anti-join
  * substring-cut plan vs the shipped interval-merge plan, alternating in
  * one session (both forced via toRdd.foreach; warmup pass first). */
object CutProbe {
  def oldCut(s: SparkSession, d: String): DataFrame = {
    val words = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), posexplode(col("ws")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"),
        size(col("ws")).cast("long").as("n_words"))
    val grams = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 10)
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), (size(col("ws")) - 10).cast("long"))).as("gpos"))
      .select(col("doc_id"), col("gpos"),
        unhex(md5(concat_ws(" ",
          slice(col("ws"), (col("gpos") + 1).cast("int"), lit(10))))).as("h"))
    val removed = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("c") > 1).select(col("doc_id"), col("gpos"))
      .select(col("doc_id"), explode(sequence(col("gpos"), col("gpos") + 9)).as("pos"))
      .distinct()
    words.join(removed, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id", "n_words")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          p => p.getField("word"))).cast("binary")).as("cleaned_md5"))
      .select(col("doc_id"), col("n_words"), col("n_kept"), col("cleaned_md5"))
      .orderBy("doc_id")
  }
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
    val s = graft.util.Sessions.build("cutprobe", sys.env.getOrElse("SPARK_GRAFT_CPUS","32"))
    def force(df: DataFrame): Unit = df.queryExecution.toRdd.foreach(_ => ())
    // warmup: touch the scan once so page-cache state is equal for both
    documents(s, d).count()
    (1 to rounds).foreach { r =>
      Seq("new" -> (() => force(graft.queries.CorpusQueries.substringCut(s, d))),
          "old" -> (() => force(oldCut(s, d)))).foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        println(f"[cutprobe] round=$r $name ${(System.nanoTime()-t0)/1e9}%.2f s")
        graft.util.SessionHygiene.scrub(s)
      }
    }
    s.stop()
  }
}
