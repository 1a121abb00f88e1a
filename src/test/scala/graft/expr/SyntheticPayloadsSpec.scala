package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import graft.TestSpark

/** Byte-identity pins for the compiled synthetic-payload constructors
  * (r15): compiled ≡ pre-r15 pure-Column spelling on the fixture corpus's
  * doc_ids plus adversarial ids — every branch residue (17/13/19/23/29 and
  * their collisions, which exercise the CASE precedence), zero, negatives,
  * and the Long extremes (where both sides must wrap identically). A null
  * id must stay null on both sides. */
class SyntheticPayloadsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def craftedIds: Seq[java.lang.Long] = {
    val residues = (0L to 120L) ++ Seq(
      221L /* 17·13 */, 247L /* 13·19 */, 323L /* 17·19 */, 299L /* 13·23 */,
      377L /* 13·29 */, 391L /* 17·23 */, 493L /* 17·29 */, 437L /* 19·23 */,
      551L /* 19·29 */, 667L /* 23·29 */, 17L * 13 * 19 * 23 * 29,
      -1L, -17L, -13L, -19L, -23L, -29L, -5L, -4L,
      Long.MaxValue, Long.MinValue, Long.MaxValue - 4, Long.MinValue + 4)
    residues.map(java.lang.Long.valueOf)
  }

  private def ids = {
    import spark.implicits._
    val crafted = craftedIds.map(Option(_)).toDF("doc_id")
    val nullRow = Seq(Option.empty[Long]).toDF("doc_id")
    graft.util.Tables.documents(spark, sf).select(col("doc_id"))
      .unionByName(crafted).unionByName(nullRow)
  }

  private def assertSame(compiled: org.apache.spark.sql.Column,
                         hof: org.apache.spark.sql.Column): Unit = {
    val df = ids.select(compiled.as("a"), hof.as("b"))
    val bad = df.filter((col("a").isNull =!= col("b").isNull) ||
      (col("a").isNotNull && col("a") =!= col("b")))
    assert(bad.count() == 0, bad.take(3).mkString("; "))
  }

  test("compiled pair_payload ≡ Column CASE tower, byte for byte") {
    assertSame(
      GraftBridge.column(PairPayload(GraftBridge.expression(col("doc_id")))),
      graft.queries.TextQueries.pairCurationPayloadHof(col("doc_id")))
  }

  test("compiled image_bmp ≡ Column syntheticBmp, byte for byte") {
    assertSame(
      GraftBridge.column(ImageBmp(GraftBridge.expression(col("doc_id")))),
      graft.queries.TextQueries.imagePayloadHof(col("doc_id")))
  }

  test("interpreted eval matches codegen (nullSafeEval path)") {
    // force the interpreted path via a driver-side eval on a few ids
    craftedIds.take(40).foreach { id =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal(id.longValue())
      val a = PairPayload(lit).eval(null).asInstanceOf[Array[Byte]]
      val b = SyntheticPayloads.pairPayload(id.longValue())
      assert(java.util.Arrays.equals(a, b))
      val c = ImageBmp(lit).eval(null).asInstanceOf[Array[Byte]]
      val d = SyntheticPayloads.imageBmp(id.longValue())
      assert(java.util.Arrays.equals(c, d))
    }
  }
}
