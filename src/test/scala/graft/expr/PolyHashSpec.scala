package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Value-equality pin: the compiled [[PolyHash]] must produce the exact
  * value of the original HOF spelling (`aggregate(split(s, ""), 0L,
  * (h, c) => pmod(h*31 + ascii(c), p))`) — every arith-MinHash oracle
  * depends on that fold, so a divergence would break q_minhash_arith /
  * q_delta_dedup / q_winnow / q_dsir_weights silently. */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def hof(s: org.apache.spark.sql.Column) =
    aggregate(split(s, ""), lit(0L),
      (h, c) => pmod(h * lit(31L) + ascii(c), lit(2147483647L)))

  test("compiled poly_hash equals the HOF fold on every corpus word and shingle") {
    val words = graft.util.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val diff = words
      .select(PolyHash.poly_hash(col("w")).as("a"), hof(col("w")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // whole-document strings exercise long inputs and spaces
    val docs = graft.util.Tables.documents(spark, sf)
      .select(PolyHash.poly_hash(col("text")).as("a"), hof(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(docs.count() == 0)
  }

  test("edge cases: empty string, unicode, surrogate pairs") {
    import spark.implicits._
    val cases = Seq("", "a", "abc", "héllo wörld", "日本語テキスト",
      "emoji 😀 pair", "mixed 漢字 and ascii 123")
    val df = cases.toDF("s")
      .select(col("s"), PolyHash.poly_hash(col("s")).as("a"), hof(col("s")).as("b"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch on '${r.getString(0)}'")
    }
  }
}
