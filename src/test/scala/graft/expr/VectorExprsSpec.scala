package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contracts for the compiled ANN hot-path expressions — load-bearing for
  * five oracle-checked queries, so equivalence with the HOF formulations
  * they replaced is pinned here, including on randomized inputs. */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("seq_dot matches the aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      SeqDot.seq_dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bits differ: $r")
    }
  }

  test("seq_dot: mismatched lengths yield null, like zip_with padding") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0))).toDF("a", "b")
    assert(df.select(SeqDot.seq_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  private def cells(vs: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double], Double)] =
    vs.map { case (id, v) => (id, v, math.sqrt(v.map(x => x * x).sum)) }

  test("nearest_cells ranks by score desc then id asc; handles n > C") {
    import spark.implicits._
    // centroids along axes: scoring vector (1, 0.5) → cell 1 then cell 2
    val cs = cells(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)))
    val df = Seq(Tuple1(Array(1.0, 0.5))).toDF("v")
    assert(df.select(NearestCells.nearest_cells(col("v"), cs, 2))
      .head().getSeq[Long](0) == Seq(1L, 2L))
    // n larger than C: returns all C cells, still ordered
    assert(df.select(NearestCells.nearest_cells(col("v"), cs, 9))
      .head().getSeq[Long](0) == Seq(1L, 2L))
  }

  test("nearest_cells breaks exact score ties on the lowest cell id") {
    import spark.implicits._
    // identical centroids under different ids → identical scores
    val cs = cells(Seq(5L -> Seq(1.0, 1.0), 3L -> Seq(1.0, 1.0), 9L -> Seq(1.0, 1.0)))
    val df = Seq(Tuple1(Array(0.3, 0.7))).toDF("v")
    assert(df.select(NearestCells.nearest_cells(col("v"), cs, 3))
      .head().getSeq[Long](0) == Seq(3L, 5L, 9L))
  }

  test("seq_dot: a null element nulls the result, like the HOF fold") {
    import spark.implicits._
    val df = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val got = df.select(
      SeqDot.seq_dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof")).head()
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("nearest_cells rejects dimension mismatch loudly, never a partial dot") {
    import spark.implicits._
    val cs = cells(Seq(1L -> Seq(1.0, 0.0, 0.0)))
    val df = Seq(Tuple1(Array(1.0, 0.5))).toDF("v") // 2 dims vs 3-dim centroid
    intercept[Exception] {
      df.select(NearestCells.nearest_cells(col("v"), cs, 1)).collect()
    }
  }

  test("nearest_cells matches the HOF argmax/sort formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cs = cells(Seq.tabulate(13)(i => i.toLong -> Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val vecs = Seq.fill(150)(Array.fill(16)(rnd.nextDouble() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "v")
    // reference: the former transform+aggregate+array_sort pipeline
    val sims = transform(typedlit(cs), c =>
      struct((aggregate(zip_with(col("v"), c.getField("_2"), (x, y) => x * y),
          lit(0.0), (acc, p) => acc + p) / c.getField("_3")).as("negless"),
        c.getField("_1").as("cell_id")))
    val refTop = slice(array_sort(transform(sims, s =>
      struct((-s.getField("negless")).as("negsim"), s.getField("cell_id").as("cell_id")))), 1, 4)
    val got = df.select(col("row_id"),
        NearestCells.nearest_cells(col("v"), cs, 4).as("fast"),
        transform(refTop, s => s.getField("cell_id")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row ${r.getLong(0)} diverged")
    }
  }
}
