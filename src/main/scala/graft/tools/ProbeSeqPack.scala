package graft.tools

/** Dev probe: wall-time of [[graft.queries.TextQueries.seqPackSharded]] at a
  * tier across shard counts (VERDICT r8 #7 done-criterion — the knob's
  * scaling evidenced at the big tier, not just fixture-scale invariance).
  * Each run is a fresh plan over the same corpus; the count() action forces
  * the windowed cumulative sum, which is the part the shard count shards.
  *
  * Usage: graft_run.sh graft.tools.ProbeSeqPack <sfDir> [shards...]
  */
object ProbeSeqPack {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val shardCounts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 8, 1024)
    val spark = graft.util.Sessions.build("graft-probe-seqpack",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // warm the file listing / scan once so the first timed run isn't
    // charged for metadata work the others get for free
    graft.util.Tables.documents(spark, d).count()
    shardCounts.foreach { k =>
      val t0 = System.nanoTime()
      val n = graft.queries.TextQueries.seqPackSharded(spark, d, k).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[seqpack] shards=$k%-6d rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
