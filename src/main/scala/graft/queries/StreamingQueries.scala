package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Declared, oracle-gated STREAMING queries — true readStream → watermark →
  * window → writeStream pipelines under `Trigger.AvailableNow`, whose final
  * sink contents are deterministic functions of the input table and hence
  * DuckDB-expressible (VERDICT r7 #5: the other streaming coverage runs
  * through specs or batch analogues; this family puts the streaming engine
  * itself inside the driver's hash gate).
  *
  * Determinism argument for the watermark rule: with AvailableNow the
  * final watermark is `max(event time) − delay` whatever the batch split,
  * and append mode emits exactly the windows whose END ≤ that watermark
  * (later windows stay in state and are discarded at query end — the
  * streaming contract, mirrored in the oracle's HAVING). Spark tracks the
  * watermark in whole milliseconds while the oracle compares in
  * microseconds — a divergence needs the max event time to land within
  * 1 ms ABOVE the exact boundary `window_end + delay`, measure-zero on
  * microsecond data and absent from the driver fixtures (verified at all
  * three tiers). */
object StreamingQueries {

  /** readStream(events) → 10-min watermark → 1-hour tumbling windows per
    * event_type → parquet sink (AvailableNow), sink read back as the query
    * result. The streaming twin of [[WindowQueries.hourlyCounts]], minus
    * the windows the watermark never closes. */
  def streamHourlyCounts(s: SparkSession, d: String): DataFrame = {
    // file streaming source needs an explicit schema: reuse the batch
    // footer's, then apply the same ts normalization the batch reader uses.
    // It also requires a DIRECTORY or a glob — the driver tiers store
    // events.parquet as a single file, so spell that case as a
    // single-file-matching glob (derived tiers are directories and pass
    // through)
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val srcPath =
      if (new java.io.File(s"$d/events.parquet").isDirectory) s"$d/events.parquet"
      else s"$d/events.parque[t]"
    val src = graft.util.Tables.normalizeEventTs(
      s.readStream.schema(rawSchema).parquet(srcPath), "ts")
    val agg = src
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val q = agg.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(out).orderBy("window_start", "event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_hourly" -> (streamHourlyCounts _))

  val oracle: Map[String, String] = Map(
    // emit rule: window end (start + 1 h) ≤ max(ts) − 10 min — the final
    // watermark under AvailableNow; GROUP BY carries mx (constant) so the
    // HAVING can reference it
    "q_stream_hourly" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
              b AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, event_type
                    FROM events)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS cnt
         FROM b, m
         GROUP BY ws, event_type, mx
         HAVING ws + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE
         ORDER BY 1, 2""")
}
