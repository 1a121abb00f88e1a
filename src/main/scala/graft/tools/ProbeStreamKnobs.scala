package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only A/B of streaming-machinery knobs on two declared shapes
  * (hourly tumbling agg; stream-stream join): each variant gets a FRESH
  * session (hadoop fs impls cache per-JVM FileSystem.CACHE keyed on conf,
  * providers cache per-session), one warm-up run, then 5 runs. Sizes where
  * the AvailableNow fixed floor can actually be cut. */
object ProbeStreamKnobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def buildSession(extra: Map[String, String]): SparkSession = {
      val b = SparkSession.builder()
        .master("local[32]").appName("graft-probe-knobs")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      extra.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def tmp(prefix: String, shm: Boolean): String = {
      val dir =
        if (shm) java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), prefix)
        else java.nio.file.Files.createTempDirectory(prefix)
      graft.util.TempLayouts.register(dir).toString
    }

    def runShape(spark: SparkSession, agg: DataFrame, shm: Boolean,
                 unload: Boolean, expectRows: Long): Double = {
      val out = tmp("knob_out", shm)
      val ckpt = tmp("knob_ckpt", shm)
      val t0 = System.nanoTime()
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (unload) org.apache.spark.sql.GraftBridge.unloadAllStateStores()
      val n = spark.read.parquet(out).count()
      val dt = (System.nanoTime() - t0) / 1e9
      require(n == expectRows, s"row drift: $n vs $expectRows")
      dt
    }

    def hourly(spark: SparkSession): DataFrame = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      graft.util.Tables.normalizeEventTs(
          spark.readStream.schema(schema).parquet(s"$sfDir/events.parque[t]"), "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("cnt"))
    }

    def join(spark: SparkSession): DataFrame = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val ev = graft.util.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(s"$sfDir/events.parque[t]"), "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .withWatermark("ts", "10 minutes")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .withWatermark("ts", "10 minutes")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"))
      clicks.join(purchases, expr(
        """user_id = p_user AND purchase_ts >= click_ts AND
           purchase_ts <= click_ts + INTERVAL 1 HOUR"""))
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
    }

    val variants: Seq[(String, Map[String, String], Boolean, Boolean)] = Seq(
      // label, session confs, shm scratch, eager unload
      ("base", Map.empty[String, String], false, false),
      ("rawlocal", Map(
        "spark.hadoop.fs.file.impl" -> "org.apache.hadoop.fs.RawLocalFileSystem"), false, false),
      ("unload", Map.empty[String, String], false, true),
      ("raw+unload", Map(
        "spark.hadoop.fs.file.impl" -> "org.apache.hadoop.fs.RawLocalFileSystem"), false, true),
      ("raw+unload+shm", Map(
        "spark.hadoop.fs.file.impl" -> "org.apache.hadoop.fs.RawLocalFileSystem"), true, true)
    )

    // expected sink rows at sf0.1 (stable fixtures)
    val shapes: Seq[(String, SparkSession => DataFrame, Long)] = Seq(
      ("hourly", hourly _, 3595L),
      ("join", join _, -1L)) // join row count probed on first run

    variants.foreach { case (label, extra, shm, unload) =>
      val spark = buildSession(extra)
      try {
        shapes.foreach { case (shapeLabel, mk, expect0) =>
          var expect = expect0
          if (expect < 0) { // probe once
            val out = tmp("knob_probe", shm); val ckpt = tmp("knob_probe_c", shm)
            val q = mk(spark).writeStream.format("parquet")
              .option("path", out).option("checkpointLocation", ckpt)
              .outputMode("append").trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
            expect = spark.read.parquet(out).count()
          } else runShape(spark, mk(spark), shm, unload, expect) // warm-up
          val ts = Seq.fill(5)(runShape(spark, mk(spark), shm, unload, expect)).sorted
          println(f"[knobs] $label%-16s $shapeLabel%-7s median=${ts(2)}%.2f " +
            s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
      } catch {
        case e: Throwable => println(s"[knobs] $label FAILED: ${e.getMessage.take(300)}")
      } finally spark.stop()
    }
  }
}
