package graft.tools

import graft.operators.CurationPipeline

/** CLI for the end-to-end training-data curation pipeline.
  * Usage: runMain graft.tools.RunCuration <sfDir> <outDir> [samplePerLang]
  */
object RunCuration {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunCuration <sfDir> <outDir> [samplePerLang]")
    val sample = if (args.length > 2) args(2).toInt else 0
    val spark = graft.util.Sessions.build("graft-curation")
    try {
      val docs = graft.util.Tables.documents(spark, args(0))
      val (curated, stages) = CurationPipeline.curate(docs,
        CurationPipeline.Config(samplePerLang = sample))
      curated.write.mode("overwrite").parquet(s"${args(1)}/documents")
      stages.foreach { case (name, n) => println(f"[curate] docs $name%-12s $n%7d rows") }
      val written = spark.read.parquet(s"${args(1)}/documents")
      println(s"[curate] docs written:      ${written.count()} rows, " +
        s"schema: ${written.columns.mkString(", ")}")

      val emb = graft.util.Tables.embeddings(spark, args(0))
      val (qemb, estages) = CurationPipeline.curateEmbeddings(emb)
      qemb.write.mode("overwrite").parquet(s"${args(1)}/embeddings")
      estages.foreach { case (name, n) => println(f"[curate] emb  $name%-12s $n%7d rows") }
      println(s"[curate] emb  written:      " +
        s"${spark.read.parquet(s"${args(1)}/embeddings").count()} rows")
    } finally spark.stop()
  }
}
