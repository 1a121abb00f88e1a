package graft.tools

/** Dev probe (VERDICT r10 #5): how much of the streaming family's per-entry
  * fixed cost is per-partition state-store machinery? Times each declared
  * q_stream_* entry under shuffle-partition counts 32/8/4 in one session
  * (state partition count is pinned from the session conf at stream start;
  * AvailableNow uses a fresh checkpoint per run so no layout compat issue).
  */
object ProbeStreamParts {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = graft.util.Sessions.build("probe-streamparts",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val entries = graft.SparkEntry.queries.filter(_._1.startsWith("q_stream_")).toSeq.sortBy(_._1)
    // warm: touch tables + one full streaming run so JIT/codegen costs land outside
    graft.util.Tables.all(s, d).values.foreach(df => df.count(): Unit)
    entries.headOption.foreach { case (_, fn) => fn(s, d).count(): Unit }
    for (parts <- Seq("32", "8", "4"); round <- 1 to 2) {
      s.conf.set("spark.sql.shuffle.partitions", parts)
      var total = 0.0
      val cols = entries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(s, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        f"$name=${sec}%.2f"
      }
      println(f"[streamparts] parts=$parts%-3s round=$round total=$total%6.2f  ${cols.mkString(" ")}")
      graft.util.SessionHygiene.scrub(s)
    }
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.stop()
  }
}
