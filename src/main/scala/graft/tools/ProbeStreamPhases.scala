package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: per-phase duration breakdown (queryPlanning, addBatch,
  * walCommit, stateStoreCommit, …) of one declared-shape AvailableNow
  * stream, from the engine's own StreamingQueryProgress — to size which
  * micro-batch phase the streaming family's fixed floor lives in. */
object ProbeStreamPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-phases", "32")
    graft.util.Tables.events(spark, sfDir).count()
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    def run(label: String, parts: String): Unit = {
      val out = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("phase_out")).toString
      val ckpt = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("phase_ckpt")).toString
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val agg = graft.util.Tables.normalizeEventTs(
          spark.readStream.schema(schema).parquet(s"$sfDir/events.parque[t]"), "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("cnt"))
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val tRun = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = spark.read.parquet(out).orderBy("window_start", "event_type").count()
      val tRead = (System.nanoTime() - t1) / 1e9
      println(f"[phases] $label%-18s run=$tRun%.2f read=$tRead%.2f rows=$n")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[phases]   batch=${p.batchId} rows=${p.numInputRows} durations=" +
          d.entrySet().toArray.map(_.toString).sorted.mkString(", "))
        p.stateOperators.foreach { so =>
          println(s"[phases]     stateOp commit=${so.commitTimeMs}ms rowsTotal=${so.numRowsTotal}")
        }
      }
    }
    run("hourly p32 cold", "32")
    run("hourly p32 warm", "32")
    run("hourly p8", "8")
    run("hourly p1", "1")
    run("hourly p8 again", "8")
    spark.stop()
  }
}
