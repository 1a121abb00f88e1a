package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: the fixed machinery floor of one AvailableNow micro-batch —
  * a pass-through stream (no stateful op) vs the declared aggregating
  * entries, to size what query-side work can still win. */
object ProbeStreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build("graft-probe-floor", "32")
    graft.util.Tables.events(spark, sfDir).count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[floor] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    def passthrough(): Long = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val out = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("floor_out")).toString
      val ckpt = graft.util.TempLayouts.register(
        java.nio.file.Files.createTempDirectory("floor_ckpt")).toString
      val q = spark.readStream.schema(schema).parquet(s"$sfDir/events.parque[t]")
        .select(col("event_id"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    t("passthrough 1")(passthrough())
    t("passthrough 2")(passthrough())
    t("passthrough 3")(passthrough())
    t("hourly warm")(graft.queries.StreamingQueries.streamHourlyCounts(spark, sfDir).count())
    t("hourly warm 2")(graft.queries.StreamingQueries.streamHourlyCounts(spark, sfDir).count())
    spark.stop()
  }
}
