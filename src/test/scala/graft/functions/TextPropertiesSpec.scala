package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.schema.CallDataSchema

/** Property-based tests (SURVEY §5.2): snake_case idempotence, Jaccard
  * bounds/symmetry, digit-strip cast truth. */
class TextPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("scrubPii redacts emails and URLs, URL pass first") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "see https://example.com/a?b=c#d and http://x.y/z",
      "address-in-url http://site.com/jane@host.com stays one URL",
      "no pii here at all",
      "two a@b.com mails c.d@e.org in one line")
    val got = rows.toDF("text")
      .select(TextFunctions.scrubPii(col("text")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "see <URL> and <URL>")
    assert(got(2) == "address-in-url <URL> stays one URL")
    assert(got(3) == "no pii here at all")
    assert(got(4) == "two <EMAIL> mails <EMAIL> in one line")
  }

  test("property: toSnakeCase is idempotent on realistic CSV headers") {
    // NOT idempotent in general: "((s))" -> "(s)" -> "s" (single-pass
    // replacement cascades on re-application) — faithful to the reference
    // (transform.py:119-128), whose real headers only carry a "(s)" suffix.
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val header = for {
      ws <- Gen.nonEmptyListOf(word)
      suffix <- Gen.oneOf("", " (s)")
      sep <- Gen.oneOf(" ", "-")
    } yield ws.mkString(sep) + suffix
    check(Prop.forAll(header) { h =>
      val once = CallDataSchema.toSnakeCase(h)
      CallDataSchema.toSnakeCase(once) == once
    })
  }

  test("toSnakeCase cascade quirk on nested (s) is preserved (reference parity)") {
    assert(CallDataSchema.toSnakeCase("((s))") == "(s)")
    assert(CallDataSchema.toSnakeCase("(s)") == "s")
  }

  test("property: toSnakeCase output never contains spaces, hyphens, or uppercase") {
    val header = Gen.listOf(Gen.oneOf(
      Gen.alphaUpperChar, Gen.alphaLowerChar, Gen.const(' '), Gen.const('-'))).map(_.mkString)
    check(Prop.forAll(header) { h =>
      val out = CallDataSchema.toSnakeCase(h)
      !out.exists(c => c == ' ' || c == '-' || c.isUpper)
    })
  }

  test("property: Jaccard is within [0,1], symmetric, and 1 for self") {
    import spark.implicits._
    val wordsGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
    val pairGen = for { a <- wordsGen; b <- wordsGen } yield (a.mkString(" "), b.mkString(" "))
    val samples = Gen.listOfN(60, pairGen).sample.get
    val df = samples.toDF("ta", "tb").select(
      TextFunctions.jaccard(TextFunctions.words(col("ta")), TextFunctions.words(col("tb"))).as("jab"),
      TextFunctions.jaccard(TextFunctions.words(col("tb")), TextFunctions.words(col("ta"))).as("jba"),
      TextFunctions.jaccard(TextFunctions.words(col("ta")), TextFunctions.words(col("ta"))).as("jaa"))
    df.collect().foreach { r =>
      val (jab, jba, jaa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab == jba, "jaccard must be symmetric")
      assert(jaa == 1.0, "self-similarity must be 1")
    }
  }

  test("property: digit-strip cast equals reference semantics on dirty strings") {
    import spark.implicits._
    val dirty = Gen.listOf(Gen.oneOf(
      Gen.numChar, Gen.alphaChar, Gen.const(' '), Gen.const('.'))).map(_.mkString)
    val samples = Gen.listOfN(120, dirty).sample.get
    val got = samples.toDF("s")
      .select(when(col("s").isNotNull,
        trim(regexp_replace(col("s"), "[^0-9]", "")).cast("int")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val want = samples.map { s =>
      val digits = s.filter(_.isDigit)
      if (digits.isEmpty || BigInt(digits.takeRight(18).mkString) > Int.MaxValue) {
        // non-ANSI cast: empty or overflowing digit strings -> null
        if (digits.isEmpty) None
        else scala.util.Try(digits.toInt).toOption
      } else Some(digits.toInt)
    }
    got.zip(want).zip(samples).foreach { case ((g, w), s) =>
      assert(g == w, s"mismatch for '$s': got $g want $w")
    }
  }
}
