package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bounded top-k aggregate: ordering, ties, partial-merge correctness. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("keeps the k best by score desc, id asc on ties — across partitions") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, 0.99),
      (2L, 20L, 0.1), (2L, 21L, 0.2))
    // repartition(5) forces map-side partials that must merge correctly
    val got = rows.toDF("g", "id", "score").repartition(5)
      .groupBy("g")
      .agg(TopKAgg.top_k(2)(col("id"), col("score")).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getLong(0), t.getDouble(1)))).toMap
    assert(got(1L) == Seq((13L, 0.99), (10L, 0.9))) // tie 0.9: id 10 < 11 wins
    assert(got(2L) == Seq((21L, 0.2), (20L, 0.1)))
  }

  test("NaN scores rank first, matching the row_number DESC window") {
    import spark.implicits._
    val rows = Seq((1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.5))
    val agg = rows.toDF("g", "id", "score").repartition(3)
      .groupBy("g").agg(TopKAgg.top_k(2)(col("id"), col("score")).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
    val window = rows.toDF("g", "id", "score")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 2).orderBy("rn")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(agg == window && agg == Seq(11L, 10L))
  }

  test("groups smaller than k return all their rows, ordered") {
    import spark.implicits._
    val got = Seq((1L, 5L, 0.3)).toDF("g", "id", "score")
      .groupBy("g").agg(TopKAgg.top_k(4)(col("id"), col("score")).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
    assert(got.map(t => (t.getLong(0), t.getDouble(1))) == Seq((5L, 0.3)))
  }
}
