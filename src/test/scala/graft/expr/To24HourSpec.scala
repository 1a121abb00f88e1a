package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

/** E1 truth table from SURVEY §5.1 + property equivalence vs java.time. */
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
  test("malformed inputs pass through unchanged (reference fallthrough, transform.py:20-23)") {
    for (bad <- Seq("", "garbage", "2023-01-15 12:00:00", "13/45/2023 12:00:00 AM",
                    "01/15/2023 13:00:00 PM", "02/30/2023 01:00:00 AM"))
      assert(To24Hour.to24h(bad) == bad)
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
