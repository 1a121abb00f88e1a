package graft.tools
object ProbeSweepLike {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100c")
    val spark = graft.util.Sessions.build("graft-sweeplike", "32")
    val t0 = System.nanoTime()
    val df = graft.queries.PipelineQueries.dedupClusters(spark, sfDir)
    val t1 = System.nanoTime()
    df.queryExecution.toRdd.foreach(_ => ())
    val t2 = System.nanoTime()
    println(f"[sweeplike] construct=${(t1-t0)/1e9}%.1f force=${(t2-t1)/1e9}%.1f total=${(t2-t0)/1e9}%.1f")
    spark.stop()
  }
}
