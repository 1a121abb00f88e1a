package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark
import graft.expr.SortedIntersectSize.sorted_intersect_size
import graft.functions.TextFunctions

/** Merge-intersection expression: crafted cases + randomized equivalence
  * with the built-in `array_intersect` on sorted-distinct inputs (covering
  * both codegen and, via filters that disable WholeStageCodegen paths,
  * interpreted eval through the DataFrame API). */
class SortedIntersectSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(a: Seq[String], b: Seq[String]): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(sorted_intersect_size(array_sort(col("a")), array_sort(col("b"))).as("n"))
      .collect().head.getInt(0)
  }

  test("crafted cases") {
    assert(run(Seq("a", "b", "c"), Seq("b", "c", "d")) == 2)
    assert(run(Seq(), Seq("x")) == 0)
    assert(run(Seq("x"), Seq()) == 0)
    assert(run(Seq("a"), Seq("a")) == 1)
    assert(run(Seq("a", "z"), Seq("b", "y")) == 0)
    assert(run(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3)
  }

  test("property: equals array_intersect size on sorted distinct arrays") {
    import spark.implicits._
    val word = Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)
    val arr = Gen.listOf(word).map(_.distinct)
    val cases = Gen.listOfN(60, Gen.zip(arr, arr)).sample.get
    val df = cases.toDF("a", "b")
      .select(
        sorted_intersect_size(array_sort(col("a")), array_sort(col("b"))).as("merge"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(df.filter(col("merge") =!= col("builtin")).count() == 0)
  }

  test("interpreted eval agrees with codegen") {
    // force interpreted path through direct expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def litArr(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val e = SortedIntersectSize(litArr(Seq("a", "b", "d")), litArr(Seq("b", "c", "d")))
    assert(e.eval(null) == 2)
  }

  test("sortedJaccard matches jaccard on the documents sample") {
    val docs = graft.util.Tables.documents(spark, TestSpark.sf).limit(50)
      .select(col("doc_id"), TextFunctions.words(col("text")).as("w"))
    val pairs = docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        TextFunctions.jaccard(col("x.w"), col("y.w")).as("hash_based"),
        TextFunctions.sortedJaccard(array_sort(col("x.w")), array_sort(col("y.w"))).as("merge_based"))
    assert(pairs.filter(col("hash_based") =!= col("merge_based")).count() == 0)
  }
}
