package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of every declared query
  * (usage: runMain graft.tools.ExplainAll [sfDir] [queryName...]) — the
  * review loop for pushdown/broadcast/codegen checks ("iterate until it's
  * the plan you'd want", builder brief).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = graft.util.Sessions.build("graft-explain")
    try graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Exception => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    } finally spark.stop()
  }
}
