package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev A/B (VERDICT r9 #4): the corpus-wide gram-occurrence count at the
  * heart of q_substring_dedup can be spelled two ways —
  *
  *   A (window):    count(*) OVER (PARTITION BY h)   — ONE shuffle of the
  *                  gram stream, but WindowExec SORTS every partition by
  *                  the 16-byte hash;
  *   B (agg+join):  groupBy(h).count() + hash join back — TWO shuffles of
  *                  the stream, but no sort anywhere (hash aggregate +
  *                  hash join).
  *
  * Same answer (checksummed here); this probe measures which plan wins at
  * a given tier so the declared query carries the measured choice, not a
  * guess. Run at 100× and 1000×; SCALING.md records the table.
  *
  * Usage: graft_run.sh graft.tools.ProbeGramCount <sfDir>
  */
object ProbeGramCount {
  private def grams(s: SparkSession, d: String): DataFrame =
    graft.util.Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 10)
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), (size(col("ws")) - 10).cast("long"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        unhex(md5(concat_ws(" ",
          slice(col("ws"), (col("pos") + 1).cast("int"), lit(10))))).as("h"))

  private def rollup(withC: DataFrame): DataFrame =
    withC.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum((col("c") > 1).cast("long")).as("n_dup"))

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-gramcount",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(label: String)(df: DataFrame): (Long, Long) = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("doc_id"), col("n_grams"), col("n_dup")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[gramcount] $label%-10s $sec%8.2f s rows=${r.getLong(0)} chk=${r.getLong(1)}")
      (r.getLong(0), r.getLong(1))
    }
    val g = grams(spark, d)
    val w = Window.partitionBy("h")
    def planA = rollup(g.withColumn("c", count(lit(1)).over(w)))
    def planB = {
      val counts = g.groupBy("h").agg(count(lit(1)).as("c"))
      rollup(g.join(counts, Seq("h")))
    }
    time("warmupA")(planA)
    val a = time("window")(planA)
    time("warmupB")(planB)
    val b = time("agg+join")(planB)
    println(s"[gramcount] content ${if (a == b) "IDENTICAL" else "DIVERGED"}")
    spark.stop()
    if (a != b) sys.exit(2)
  }
}
