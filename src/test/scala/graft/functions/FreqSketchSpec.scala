package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Misra–Gries guarantees on a crafted skewed stream, across partitions. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heavy items survive with counts undercounting by at most n/(k+1)") {
    import spark.implicits._
    val k = 8
    // 500 "hot", 200 "warm", 300 singletons → n = 1000
    val words = Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 300).map(i => s"rare_$i")
    val n = words.size
    val sketch = scala.util.Random.shuffle(words).toDF("w").repartition(7)
      .agg(FreqSketch.heavy_hitters(k)(col("w")).as("hh"))
      .head().getMap[String, Long](0)
    assert(sketch.size <= k)
    val slack = n / (k + 1)
    assert(sketch.contains("hot"), s"hot missing from $sketch")
    assert(sketch("hot") >= 500 - slack && sketch("hot") <= 500)
    assert(sketch.getOrElse("warm", 0L) >= 200 - slack)
  }

  test("items below the n/(k+1) threshold may vanish, heavy ones never do") {
    import spark.implicits._
    val k = 2
    val words = Seq.fill(60)("dominant") ++ (0 until 40).map(i => s"x$i")
    val sketch = words.toDF("w").repartition(3)
      .agg(FreqSketch.heavy_hitters(k)(col("w")).as("hh"))
      .head().getMap[String, Long](0)
    // dominant has freq 60 > 100/3 — guaranteed to survive
    assert(sketch.contains("dominant"))
  }

  test("sketch + exact re-count is deterministic across partition merge orders") {
    import spark.implicits._
    // MG sketch CONTENTS vary with merge order (trim is not associative),
    // but the two-pass construction — survivors re-counted exactly, kept
    // above the n/(k+1) guarantee — must not (the q_heavy_hitters_sketch
    // contract)
    val k = 4
    val words = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(90)("gamma") ++ (0 until 410).map(i => s"noise_$i")
    def twoPass(parts: Int): Seq[(String, Long)] = {
      val df = scala.util.Random.shuffle(words).toDF("word").repartition(parts)
      val first = df.agg(FreqSketch.heavy_hitters(k)(col("word")).as("hh"),
        count(lit(1)).as("n")).head()
      val survivors = first.getMap[String, Long](0).keys.toSeq
      val n = first.getLong(1)
      df.filter(col("word").isInCollection(survivors))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(k + 1) > lit(n))
        .orderBy(col("cnt").desc, col("word"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val runs = Seq(twoPass(1), twoPass(3), twoPass(13))
    assert(runs.distinct.size == 1, s"two-pass result varied: $runs")
    // alpha (300) and beta (200) exceed n/(k+1) = 200 ... alpha certainly does
    assert(runs.head.map(_._1).contains("alpha"))
  }
}
