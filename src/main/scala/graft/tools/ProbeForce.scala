package graft.tools

/** Dev tool: time named queries under a FORCING action
  * (`queryExecution.toRdd.foreach`) instead of Bench/SweepTier's
  * `count()`. For a pure-projection query (e.g. q_winnow) `count()`
  * column-prunes the entire computation down to a scan row-count, so its
  * sweep timing measures nothing; this probe executes every output
  * expression for every row without collecting anything to the driver.
  * Used for the SCALING.md numbers of map-only queries.
  *
  * Usage: runMain graft.tools.ProbeForce <sfDir> <query> [<query>...]
  */
object ProbeForce {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.util.Sessions.build("graft-probe-force",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      println(String.format(java.util.Locale.ROOT,
        "[force] %s sec=%.2f", name, Double.box(sec)))
      graft.util.SessionHygiene.scrub(spark)
    }
    spark.stop()
  }
}
