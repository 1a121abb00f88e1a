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
      curated.write.mode("overwrite").parquet(args(1))
      stages.foreach { case (name, n) => println(f"[curate] $name%-12s $n%7d rows") }
      val written = spark.read.parquet(args(1))
      println(s"[curate] written:      ${written.count()} rows, " +
        s"schema: ${written.columns.mkString(", ")}")
    } finally spark.stop()
  }
}
