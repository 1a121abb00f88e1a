package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Value-equality pin: the compiled [[Simhash32]] must reproduce the HOF
  * spelling (`aggregate`/`zip_with` over per-word polyHashes) exactly —
  * q_simhash_arith's generated per-bit DuckDB oracle depends on these
  * values. */
class Simhash32Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val edgeTexts = Seq(
    "",                  // one empty word: all sums -1 -> 0
    " ",                 // two empty words
    "a",
    "a b c",
    "a  b",              // empty middle word
    " lead trail ",      // leading/trailing empties
    "x x x y",           // frequency weighting matters
    "é 世 𝄞 b"  // multibyte + surrogate pair
  )

  test("compiled simhash32 equals the HOF spelling on the real corpus + edges") {
    import spark.implicits._
    val df = graft.util.Tables.documents(spark, sf).select(col("text"))
      .unionByName(edgeTexts.toDF("text"))
      .select(graft.operators.Dedup.arithSimhash32(col("text")).as("a"),
        graft.operators.Dedup.arithSimhash32Hof(col("text")).as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("null text yields null; empty text yields 0") {
    import spark.implicits._
    val rows = Seq(Option(""), None).toDF("text")
      .select(col("text"), Simhash32.simhash32(col("text")).as("h"))
      .orderBy(col("text").asc_nulls_last)
      .collect()
    assert(rows(0).getLong(1) == 0L)
    assert(rows(1).isNullAt(1))
  }
}
