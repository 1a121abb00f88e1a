package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

/** Behavioral pins for [[NormalizeText]] -- the q_normalize_text oracle
  * checks cross-engine agreement on the real corpus; here we pin the
  * contract on crafted strings each rule owns, plus the codegen path. */
class NormalizeTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def norm(s: String): String =
    NormalizeText.compute(UTF8String.fromString(s)).toString

  test("NFC composes decomposed combining sequences") {
    assert(norm("e\u0301") == "\u00E9")       // e + combining acute -> e-acute
    assert(norm("A\u030A") == "\u00C5")       // A + combining ring  -> A-ring
    assert(norm("already \u00E9") == "already \u00E9") // composed input unchanged
  }

  test("NFC singleton mappings apply even when length is preserved") {
    // U+212B ANGSTROM SIGN -> U+00C5: same length, different content -- the
    // case that would silently return the raw input if the identity
    // fast-path keyed on length alone
    assert(norm("\u212B") == "\u00C5")
  }

  test("controls become spaces and never survive length-preserving rewrites") {
    // control substitution preserves length -- must still produce new content
    assert(norm("a\u0007b") == "a b")
    assert(norm("a\u0007 \u000Bb") == "a b")
    assert(norm("a\u007Fb") == "a b")
  }

  test("space runs collapse; leading/trailing whitespace trims") {
    assert(norm("  a   b  ") == "a b")
    assert(norm("\u0009a") == "a")     // leading controls trim away
    assert(norm("a\u0007\u0007") == "a") // trailing controls trim away
    assert(norm("") == "")
    assert(norm(" \u0007 ") == "")     // whitespace-only collapses to empty
  }

  test("identity fast-path returns clean text unchanged") {
    assert(norm("plain ascii text.") == "plain ascii text.")
  }

  test("codegen and interpreted paths agree on the corpus fixture") {
    val raw = concat(
      lit("e\u0301 A\u030A\u0007tab  "), col("text"), lit(" \u000B\u007F x  "))
    val df = graft.util.Tables.documents(spark, sf)
      .select(raw.as("raw"), NormalizeText.normalize_text(raw).as("n"))
    // the generated path runs inside WholeStageCodegen; compare per-row
    // against the interpreted compute on the driver
    df.collect().foreach { r =>
      assert(r.getString(1) == norm(r.getString(0)))
    }
    // null flows through as null
    val nr = spark.range(1)
      .select(NormalizeText.normalize_text(lit(null).cast("string")))
      .head()
    assert(nr.isNullAt(0))
  }
}
