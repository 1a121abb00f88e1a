package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** Value-identity pins for the compiled [[SpanMd5s]] pass (r14): the
  * digest arrays must equal the Column spellings they replaced —
  * per-position sliding 10-grams (substring_dedup / source_overlap /
  * substring_cut), aligned 10-word passages (para_dedup), and the
  * distinct 5-gram stream (decontam twins) — element for element, order
  * included, on the real corpus plus edge texts. */
class SpanMd5sSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val edgeTexts = Seq(
    "", " ", "a", "a b c d e f g h i",          // < 10 words -> empty
    "a b c d e f g h i j",                      // exactly 10
    "a b c d e f g h i j k l m n o p q r s t",  // 20 words: 2 aligned passages
    "a  b c d e f g h i j k",                   // consecutive spaces
    " a b c d e f g h i j ",                    // leading/trailing empties
    "x y x y x y x y x y x y x y x y x y x y",  // duplicate grams
    "é 世 𝄞 a b c d e f g h"          // multibyte + surrogate pair
  )

  private def corpus = {
    import spark.implicits._
    graft.util.Tables.documents(spark, sf).select(col("text"))
      .unionByName(edgeTexts.toDF("text"))
  }

  test("sliding 10-gram digests equal the slice/concat_ws/md5 spelling") {
    val ws = split(col("text"), " ")
    val old = when(size(ws) >= 10,
      transform(sequence(lit(0L), (size(ws) - 10).cast("long")),
        pos => unhex(md5(concat_ws(" ", slice(ws, (pos + 1).cast("int"), lit(10)))))))
      .otherwise(array().cast("array<binary>"))
    val df = corpus.select(
      SpanMd5s.span_md5s(col("text"), 10).as("a"), old.as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("aligned 10-word passage digests equal the strided slice spelling") {
    val ws = split(col("text"), " ")
    val old = when(size(ws) >= 10,
      transform(sequence(lit(0L), (size(ws) / 10).cast("long") - 1),
        pos => unhex(md5(concat_ws(" ", slice(ws, (pos * 10 + 1).cast("int"), lit(10)))))))
      .otherwise(array().cast("array<binary>"))
    val df = corpus.select(
      SpanMd5s.span_md5s(col("text"), 10, stride = 10).as("a"), old.as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("distinct 5-gram digests equal md5 over wordShinglesStrict") {
    val old = transform(TextFunctions.wordShinglesStrict(col("text"), 5),
      sh => unhex(md5(sh)))
    val df = corpus.select(
      SpanMd5s.span_md5s(col("text"), 5, distinct = true).as("a"), old.as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("null text yields null") {
    import spark.implicits._
    val rows = Seq(Option.empty[String]).toDF("text")
      .select(SpanMd5s.span_md5s(col("text"), 10).as("a")).collect()
    assert(rows(0).isNullAt(0))
  }
}
