package graft.tools
import org.apache.spark.sql.DataFrame
/** Dev: one forced run of old|new substring-cut plan after a warm scan. */
object CutProbe2 {
  def main(args: Array[String]): Unit = {
    val d = args(0); val which = args(1)
    val s = graft.util.Sessions.build("cutprobe2", sys.env.getOrElse("SPARK_GRAFT_CPUS","32"))
    graft.util.Tables.documents(s, d).count()
    val df: DataFrame =
      if (which == "old") CutProbe.oldCut(s, d)
      else graft.queries.CorpusQueries.substringCut(s, d)
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreach(_ => ())
    println(f"[cutprobe2] $which ${(System.nanoTime()-t0)/1e9}%.2f s")
    s.stop()
  }
}
