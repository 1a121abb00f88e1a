package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** Value-equality pin: the fused [[MinhashSigs]] loop must reproduce the
  * 8 HOF signature columns exactly (same arithPerms constants, same
  * polyHash fold) — q_minhash_arith's and q_delta_dedup's oracles depend
  * on these values. */
class MinhashSigsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fused sigs equal the 8 HOF sig columns on the real corpus") {
    val perms = graft.operators.Dedup.arithPerms
    assert(perms.length == 8)
    val sh = TextFunctions.wordShingles(col("text"), 3)
    val hofHashes = transform(sh, s =>
      aggregate(split(s, ""), lit(0L),
        (h, c) => pmod(h * lit(31L) + ascii(c), lit(2147483647L))))
    val hofCols = perms.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(hofHashes,
        h => pmod(h * lit(a) + lit(b), lit(2147483647L)))).as(s"hof_$i")
    }
    val fused = graft.operators.Dedup.arithMinhashColumns(col("text"))
    val df = graft.util.Tables.documents(spark, sf)
      .select((fused ++ hofCols): _*)
    val diff = (0 until 8).map(i => col(s"sig_$i") =!= col(s"hof_$i"))
      .reduce(_ || _)
    assert(df.filter(diff).count() == 0)
  }

  test("null and empty shingle arrays yield null sigs (array_min parity)") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("a b c d")).toDF("sh")
      .select(col("sh"), MinhashSigs.minhash_sigs(col("sh")).as("sigs"))
      .orderBy(size(col("sh")))
    val rows = df.collect()
    assert(rows(0).isNullAt(1), "empty array must give null sigs")
    assert(!rows(1).isNullAt(1) && rows(1).getSeq[Long](1).length == 8)
  }

  test("nullable even over a NON-nullable child: empty-array null survives collect and IS NULL") {
    // regression (code review): inheriting child.nullable made a
    // non-nullable array() literal child declare non-null output while
    // eval returned null — collect() threw EXPRESSION_DECODING_FAILED
    // and the optimizer folded IS NULL filters to false
    val df = spark.range(1)
      .select(MinhashSigs.minhash_sigs(
        array().cast("array<string>")).as("sigs"))
    assert(df.schema("sigs").nullable)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).isNullAt(0))
    assert(df.filter(col("sigs").isNull).count() == 1)
  }
}
