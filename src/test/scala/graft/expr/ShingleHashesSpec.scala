package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** Consumer-identity pins for the fused [[ShingleHashes]] pass (r14):
  * the compiled per-position shingle polyHashes must be interchangeable
  * with `transform(wordShingles(text, n), polyHash)` for every consumer
  * the library actually has — signature minima (duplicate-insensitive),
  * sorted-distinct hash sets (string-dedup-then-hash ≡ hash-then-dedup),
  * and the positioned winnowing gram stream (where the old spelling never
  * deduplicated either, so the arrays must be IDENTICAL). */
class ShingleHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val edgeTexts = Seq(
    "",                      // one empty word
    " ",                     // two empty words
    "a",                     // single short word
    "a b",                   // 2 words < n
    "a b c",                 // exactly n
    "a  b c",                // consecutive spaces: empty middle word
    " a b c ",               // leading + trailing spaces
    "x y z x y z x y z",     // duplicate shingles
    "é 世 𝄞 b c", // multibyte + surrogate pair
    "a b c d e f g"
  )

  test("minhash sigs from shingle_hashes equal the wordShingles HOF sigs (corpus + edges)") {
    val fused = graft.operators.Dedup.arithMinhashColumns(col("text"))
    val hof = graft.operators.Dedup.arithMinhashColumnsHof(col("text"))
      .zipWithIndex.map { case (c, i) => c.as(s"hof_$i") }
    val corpus = graft.util.Tables.documents(spark, sf).select(col("text"))
    import spark.implicits._
    val edges = edgeTexts.toDF("text")
    val df = corpus.unionByName(edges).select((fused ++ hof): _*)
    val diff = (0 until 8).map(i =>
      col(s"sig_$i") =!= col(s"hof_$i") ||
        (col(s"sig_$i").isNull =!= col(s"hof_$i").isNull)).reduce(_ || _)
    assert(df.filter(diff).count() == 0)
  }

  test("sorted-distinct hash set from shingle_hashes equals the wordShingles spelling") {
    val viaFused = array_sort(array_distinct(
      ShingleHashes.shingle_hashes(col("text"), 3)))
    val viaHof = array_sort(array_distinct(
      transform(TextFunctions.wordShingles(col("text"), 3),
        graft.operators.Dedup.polyHash(_))))
    import spark.implicits._
    val df = graft.util.Tables.documents(spark, sf).select(col("text"))
      .unionByName(edgeTexts.toDF("text"))
      .select(viaFused.as("a"), viaHof.as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("emptyIfShort positioned grams equal the winnowing HOF spelling") {
    val K = 3
    val viaFused = ShingleHashes.shingle_hashes(col("text"), K, emptyIfShort = true)
    val ws = split(col("text"), " ")
    val viaHof = when(size(ws) < K, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(ws) - (K - 1)),
        j => graft.operators.Dedup.polyHash(concat_ws(" ", slice(ws, j, lit(K))))))
    import spark.implicits._
    val df = graft.util.Tables.documents(spark, sf).select(col("text"))
      .unionByName(edgeTexts.toDF("text"))
      .select(viaFused.as("a"), viaHof.as("b"))
    // positioned arrays must match element-for-element, order included
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("null text yields null; short text yields whole-text hash or empty per mode") {
    import spark.implicits._
    val df = Seq(Option("a b"), None).toDF("text")
      .select(col("text"),
        ShingleHashes.shingle_hashes(col("text"), 3).as("fb"),
        ShingleHashes.shingle_hashes(col("text"), 3, emptyIfShort = true).as("em"))
      .orderBy(col("text").asc_nulls_last)
    val rows = df.collect()
    assert(rows(0).getSeq[Long](1) ==
      Seq(graft.expr.PolyHash.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b"))))
    assert(rows(0).getSeq[Long](2).isEmpty)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }
}
