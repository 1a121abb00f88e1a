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
}
