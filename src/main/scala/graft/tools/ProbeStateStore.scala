package graft.tools

import org.apache.spark.sql.functions._

/** Dev A/B (VERDICT r9 #3b): run every declared q_stream_* entry under the
  * default HDFSBackedStateStoreProvider and under RocksDB, print per-entry
  * wall seconds, and check the two providers produce content-identical
  * results (row count + order-independent xxhash64 checksum — the provider
  * must never change WHAT a stateful operator emits, only where its state
  * lives).
  *
  * The RocksDB leg sets the `spark.graft.statestore` system property —
  * the in-JVM override channel the entries' provider choosers consult
  * before their automatic size/row triggers. (Setting the session conf
  * directly stopped working in r11 when the entries began re-choosing
  * the provider per stream: each runAvailableNow sets-or-unsets the
  * conf, silently overwriting anything this tool set.)
  *
  * Usage: graft_run.sh graft.tools.ProbeStateStore <sfDir>
  */
object ProbeStateStore {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.util.Sessions.build("graft-probe-statestore",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val entries = graft.queries.StreamingQueries.all.toSeq.sortBy(_._1)

    def runAll(label: String): Seq[(String, Double, Long, Long)] =
      entries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        val sums = df.agg(count(lit(1)),
          sum(xxhash64(struct(df.columns.map(col): _*)))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = sums.getLong(0)
        val chk = if (sums.isNullAt(1)) 0L else sums.getLong(1)
        println(f"[statestore] $label%-8s $name%-22s $sec%7.2f s rows=$rows chk=$chk")
        (name, sec, rows, chk)
      }

    runAll("warmup") // session/codegen/FS warm so the A and B legs compare clean
    sys.props("spark.graft.statestore") = "default"
    val base = runAll("default")
    sys.props("spark.graft.statestore") = "rocksdb"
    val rocks = runAll("rocksdb")
    val byName = rocks.map(r => r._1 -> r).toMap
    var diverged = false
    base.foreach { case (name, bSec, bRows, bChk) =>
      val (_, rSec, rRows, rChk) = byName(name)
      val same = bRows == rRows && bChk == rChk
      if (!same) diverged = true
      println(f"[statestore] A/B      $name%-22s default=$bSec%6.2f s rocksdb=$rSec%6.2f s " +
        f"ratio=${rSec / bSec}%5.2f content=${if (same) "IDENTICAL" else "DIVERGED"}")
    }
    val bTot = base.map(_._2).sum
    val rTot = rocks.map(_._2).sum
    println(f"[statestore] TOTAL default=$bTot%.2f s rocksdb=$rTot%.2f s ratio=${rTot / bTot}%.2f")
    spark.stop()
    if (diverged) sys.exit(2)
  }
}
