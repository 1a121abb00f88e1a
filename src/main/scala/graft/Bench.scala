package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Sessions.build("graft-bench", cpus)
    // Warm-up: touch every table once (FS metadata, codegen, JIT) so the
    // first measured query doesn't absorb one-time session costs.
    graft.util.Tables.all(spark, sfDir).values.foreach(df => df.count(): Unit)
    // Median of 3 runs per query: single-run numbers swing ±30% with
    // machine load, which is larger than most real plan differences.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
