package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bit-identity pin: the spillable (value, count) quantile plan must
  * reproduce the built-in `percentile` aggregate EXACTLY — the q_median /
  * q_quantiles oracle hashes encode that arithmetic (floor/ceil bracketing,
  * `vLow·(higher−pos) + vHigh·(pos−lower)`), so a divergence in any branch
  * (exact-index hit, interpolated, duplicate-heavy, two-value group) would
  * break the gate silently. */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("byGroup equals the percentile aggregate bitwise on lineitem") {
    val li = graft.util.Tables.lineitem(spark, sf)
    val builtin = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.25)).as("q25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("q50"),
        percentile(col("l_extendedprice"), lit(0.75)).as("q75"))
      .orderBy("l_returnflag").collect()
    val ours = ExactQuantiles
      .byGroup(li, "l_returnflag", "l_extendedprice",
        Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75))
      .orderBy("l_returnflag").collect()
    assert(builtin.length == ours.length)
    builtin.zip(ours).foreach { case (b, o) =>
      assert(b.getString(0) == o.getString(0))
      for (i <- 1 to 3) {
        assert(java.lang.Double.doubleToLongBits(b.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(o.getDouble(i)),
          s"group ${b.getString(0)} q$i: ${b.getDouble(i)} vs ${o.getDouble(i)}")
      }
    }
  }

  test("byGroupAuto routes by input size and both routes agree") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("b", 9.0)).toDF("g", "v")
    val qs = Seq("q50" -> 0.5)
    val small = ExactQuantiles.byGroupAuto(df, "g", "v", qs, inputBytes = 1L << 20)
    val big = ExactQuantiles.byGroupAuto(df, "g", "v", qs,
      inputBytes = ExactQuantiles.SmallInputBytes + 1)
    // routing: the small route is a plain aggregate (percentile), the big
    // route carries the rollup's window
    assert(small.queryExecution.executedPlan.toString.contains("percentile"),
      "small input did not take the buffer route")
    assert(big.queryExecution.executedPlan.toString.contains("Window"),
      "large input did not take the spillable route")
    // value identity across routes
    assert(small.orderBy("g").collect().toSeq == big.orderBy("g").collect().toSeq)
  }

  test("byGroup matches percentile on crafted edge groups") {
    import spark.implicits._
    // exact-index hits (odd n), interpolation (even n), heavy duplicates,
    // single-value group, two-value group
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),                       // odd
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 10.0),          // even
      ("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 7.0),           // dup-heavy
      ("d", 42.0),                                              // single
      ("e", 1.0), ("e", 100.0)                                  // two values
    ).toDF("g", "v")
    val qs = Seq("q10" -> 0.1, "q25" -> 0.25, "q50" -> 0.5,
      "q75" -> 0.75, "q90" -> 0.9, "q100" -> 1.0)
    val builtin = df.groupBy("g")
      .agg(qs.map { case (n, q) =>
        percentile(col("v"), lit(q)).as(n)
      }.head, qs.map { case (n, q) => percentile(col("v"), lit(q)).as(n) }.tail: _*)
      .orderBy("g").collect()
    val ours = ExactQuantiles.byGroup(df, "g", "v", qs).orderBy("g").collect()
    builtin.zip(ours).foreach { case (b, o) =>
      for (i <- 1 to qs.length) {
        assert(java.lang.Double.doubleToLongBits(b.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(o.getDouble(i)),
          s"group ${b.getString(0)} ${qs(i - 1)._1}: ${b.getDouble(i)} vs ${o.getDouble(i)}")
      }
    }
  }

  test("all-null group emits a null-quantile row on BOTH routes (ADVICE r12 #1)") {
    import spark.implicits._
    // group "z" has only null values: the built-in percentile route emits
    // (z, null, null); a pre-filtered rollup would drop the group entirely,
    // so the input-size route choice would change output SHAPE
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)),
      ("z", None: Option[Double]), ("z", None: Option[Double])
    ).toDF("g", "v")
    val qs = Seq("q25" -> 0.25, "q50" -> 0.5)
    val small = ExactQuantiles.byGroupAuto(df, "g", "v", qs, inputBytes = 1L)
      .orderBy("g").collect()
    val big = ExactQuantiles.byGroup(df, "g", "v", qs).orderBy("g").collect()
    assert(small.length == 2 && big.length == 2,
      s"all-null group dropped: small=${small.length} big=${big.length}")
    assert(small.map(_.getString(0)).toSeq == Seq("a", "z"))
    assert(big.map(_.getString(0)).toSeq == Seq("a", "z"))
    // the z row's quantiles are null on both routes; a's are bit-identical
    for (i <- 1 to qs.length) {
      assert(small(1).isNullAt(i) && big(1).isNullAt(i),
        s"all-null group quantile $i not null")
      assert(java.lang.Double.doubleToLongBits(small(0).getDouble(i)) ==
        java.lang.Double.doubleToLongBits(big(0).getDouble(i)))
    }
  }

  test("byGroup skips nulls exactly like the percentile aggregate (ADVICE r11 #1)") {
    import spark.implicits._
    // nulls interleaved in every group shape: without the up-front filter
    // the rollup counts null rows into __n (they sort first under the
    // cumulative window) and every quantile position shifts
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", None), ("b", None), ("b", Some(7.0)),
      ("c", Some(5.0)), ("c", Some(9.0)), ("c", None)
    ).toDF("g", "v")
    val qs = Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75)
    val builtin = df.groupBy("g")
      .agg(qs.map { case (n, q) => percentile(col("v"), lit(q)).as(n) }.head,
        qs.map { case (n, q) => percentile(col("v"), lit(q)).as(n) }.tail: _*)
      .orderBy("g").collect()
    val ours = ExactQuantiles.byGroup(df, "g", "v", qs).orderBy("g").collect()
    assert(builtin.length == ours.length)
    builtin.zip(ours).foreach { case (b, o) =>
      for (i <- 1 to qs.length)
        assert(java.lang.Double.doubleToLongBits(b.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(o.getDouble(i)),
          s"group ${b.getString(0)} ${qs(i - 1)._1}: ${b.getDouble(i)} vs ${o.getDouble(i)}")
    }
  }
}
