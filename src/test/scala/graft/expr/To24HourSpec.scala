package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

/** E1 truth table from SURVEY §5.1 (updated to the reference's actual
  * lenient split-and-rewrite semantics, transform.py:8-21) + property
  * equivalence vs java.time on well-formed inputs — on zero-padded valid
  * timestamps the lenient rewrite and strict strptime agree exactly. */
class To24HourSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }
  private lazy val spark = TestSpark.spark

  test("12:xx:xx AM maps to hour 00") {
    assert(To24Hour.to24h("01/15/2023 12:05:30 AM") == "01/15/2023 00:05:30")
  }
  test("12:xx:xx PM stays hour 12") {
    assert(To24Hour.to24h("01/15/2023 12:05:30 PM") == "01/15/2023 12:05:30")
  }
  test("PM adds 12 hours") {
    assert(To24Hour.to24h("06/01/2024 03:10:00 PM") == "06/01/2024 15:10:00")
  }
  test("AM below 12 unchanged") {
    assert(To24Hour.to24h("06/01/2024 03:10:00 AM") == "06/01/2024 03:10:00")
  }
  test("structurally malformed inputs pass through unchanged (transform.py:20-21)") {
    for (bad <- Seq("", "garbage", "2023-01-15 12:00:00", "01/15/2023 1205 AM",
                    "01/15/2023  12:05:00 AM", "01/15/2023 12:05:00 AM "))
      assert(To24Hour.to24h(bad) == bad)
  }

  test("lenient split-and-rewrite: no padding, no validation (transform.py:12-19)") {
    // non-zero-padded hour converts (the strict-strptime divergence ADVICE pinned)
    assert(To24Hour.to24h("01/15/2023 1:05:00 PM") == "01/15/2023 13:05:00")
    // hour 00 with AM isn't "12", so it rides through untouched
    assert(To24Hour.to24h("01/15/2023 00:30:00 AM") == "01/15/2023 00:30:00")
    // nothing validates the fields: impossible values are rebuilt verbatim,
    // and the rebuild always drops the period suffix
    assert(To24Hour.to24h("13/45/2023 12:00:00 AM") == "13/45/2023 00:00:00")
    assert(To24Hour.to24h("01/15/2023 13:00:00 PM") == "01/15/2023 25:00:00")
    assert(To24Hour.to24h("02/30/2023 01:00:00 AM") == "02/30/2023 01:00:00")
    // non-integer hour with PM → int() raises → passthrough keeps the suffix
    assert(To24Hour.to24h("01/15/2023 xx:00:00 PM") == "01/15/2023 xx:00:00 PM")
    // unknown period: no branch fires but the rebuild still happens
    assert(To24Hour.to24h("01/15/2023 03:00:00 UTC") == "01/15/2023 03:00:00")
  }

  test("expression path (codegen) agrees with the pure function, nulls stay null") {
    import spark.implicits._
    val in = Seq("01/15/2023 12:05:30 AM", "06/01/2024 03:10:00 PM", "nope", null)
    val df = in.toDF("raw").select(To24Hour.to_24h(col("raw")).as("out"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    val want = in.map(s => if (s == null) null else To24Hour.to24h(s))
    assert(got == want)
  }

  test("property: matches java.time formatter on arbitrary valid timestamps") {
    val gen = for {
      epochSec <- Gen.choose(0L, 4102444800L) // 1970..2100
    } yield java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
    check(Prop.forAll(gen) { ldt =>
      val inFmt = java.time.format.DateTimeFormatter
        .ofPattern("MM/dd/uuuu hh:mm:ss a", java.util.Locale.US)
      val outFmt = java.time.format.DateTimeFormatter
        .ofPattern("MM/dd/uuuu HH:mm:ss", java.util.Locale.US)
      To24Hour.to24h(ldt.format(inFmt)) == ldt.format(outFmt)
    })
  }

  test("whole-stage codegen stays enabled around to_24h (no BatchEvalPython analogue)") {
    // Must scan a real source: a literal Seq collapses to LocalTableScan with
    // no codegen span regardless of the expression.
    val df = graft.util.Tables.documents(spark, graft.TestSpark.sf)
      .select(To24Hour.to_24h(col("text")).as("out"))
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [to_24h"), s"plan lost codegen:\n$plan")
    assert(df.count() > 0)
  }
}
