package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.TestSpark

/** Value-equality pins: the compiled [[CharEntropy]] and
  * [[NgramCardinality]] must reproduce the original HOF spellings
  * BIT-IDENTICALLY — q_repetition's and q_ngram_cardinality's DuckDB
  * oracles encode those spellings, so any divergence (summation order, a
  * trailing split element, surrogate handling) would break the hash gate
  * silently. */
class TextExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def entropyHof(text: Column): Column = {
    val chars = split(text, "")
    val n = length(text).cast("double")
    val uniq = array_sort(array_distinct(chars))
    when(length(text) === 0, lit(0.0)).otherwise(
      -aggregate(uniq, lit(0.0), (acc, c) => {
        val p = size(filter(chars, x => x === c)).cast("double") / n
        acc + p * log(p)
      }))
  }

  private def ngramsHof(text: Column, n: Int): Column =
    when(length(text) < n, lit(0)).otherwise(
      size(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => call_function("substring", text, i, lit(n))))))

  test("compiled char_entropy is bit-identical to the HOF fold on every corpus doc") {
    val diff = graft.util.Tables.documents(spark, sf)
      .select(CharEntropy.char_entropy(col("text")).as("a"),
        entropyHof(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("compiled char_entropy matches the HOF on edge shapes") {
    import spark.implicits._
    // single repeated char (p=1 -> ±0.0), surrogate pairs, non-ASCII,
    // empty, one char, uniform distribution
    val edge = Seq("", "a", "aaaa", "ab", "abab",
      "😀😀x", "café café", "z y x w v")
      .toDF("text")
    val rows = edge.select(col("text"),
      CharEntropy.char_entropy(col("text")).as("a"),
      entropyHof(col("text")).as("b")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0 ||
        (r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0),
        s"entropy mismatch on '${r.getString(0)}': ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
    // null flows through
    val nr = spark.range(1)
      .select(CharEntropy.char_entropy(lit(null).cast("string"))).head()
    assert(nr.isNullAt(0))
  }

  test("compiled ngram_cardinality equals the HOF spelling on the corpus and edges") {
    val diff = graft.util.Tables.documents(spark, sf)
      .select(NgramCardinality.ngram_cardinality(col("text"), 3).as("a"),
        ngramsHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 5)) {
      val edge = Seq("", "a", "ab", "abc", "aaaa", "abcabc",
        "😀😀😁", "café!")
        .toDF("text")
      val rows = edge.select(col("text"),
        NgramCardinality.ngram_cardinality(col("text"), n).as("a"),
        ngramsHof(col("text"), n).as("b")).collect()
      rows.foreach { r =>
        assert(r.getInt(1) == r.getInt(2),
          s"n=$n mismatch on '${r.getString(0)}': ${r.getInt(1)} vs ${r.getInt(2)}")
      }
    }
  }
}
