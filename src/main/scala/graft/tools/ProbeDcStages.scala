package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
object ProbeDcStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100c")
    val spark = graft.util.Sessions.build("graft-dc-stages", "32")
    val docs = graft.util.Tables.documents(spark, sfDir)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[dc] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val blockExpr = concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long"))
    val proj = docs.select(col("doc_id").as("id"), blockExpr.as("block"),
      array_sort(TextFunctions.words(col("text"))).as("w"))
    t("words proj count")(proj.count())
    val withK = proj.withColumn("k", md5(to_json(struct(col("block"), col("w")))))
    t("snap(full)")(graft.util.Snapshots.snap(withK).count())
    val full = graft.util.Snapshots.snap(withK)
    t("skeleton snap")(graft.util.Snapshots.snap(
      full.groupBy("block", "k").agg(count(lit(1)).as("g"),
        min(col("id")).as("rep_id"), first(col("w")).as("w"))).count())
    t("edges e2e")(graft.operators.Dedup.jaccardNearDupEdges(docs, "doc_id", "text",
      blockExpr = blockExpr, threshold = 0.5).count())
    spark.stop()
  }
}
