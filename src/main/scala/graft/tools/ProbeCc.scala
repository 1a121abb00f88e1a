package graft.tools
import org.apache.spark.sql.functions._
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-cc", "32")
    val docs = graft.util.Tables.documents(spark, sfDir)
    docs.count()
    val blockExpr = concat_ws("|", col("lang"), floor(col("n_chars") / 25).cast("long"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[cc-probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val pairs = graft.operators.Dedup.jaccardNearDupEdges(docs, "doc_id", "text",
      blockExpr = blockExpr, threshold = 0.5)
    t("edges count")(pairs.count())
    val canon = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
    t("canonical distinct edges")(canon.count())
    t("warm full query 1")(graft.queries.PipelineQueries.dedupClusters(spark, sfDir).count())
    t("warm full query 2")(graft.queries.PipelineQueries.dedupClusters(spark, sfDir).count())
    spark.stop()
  }
}
