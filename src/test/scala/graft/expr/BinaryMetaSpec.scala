package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Multimodal

/** Value-identity pins for the compiled binary-header expressions (r14):
  * compiled ≡ pre-r14 pure-Column spelling, field for field, on the real
  * fixture payloads (every synthesis arm of the declared multimodal
  * queries) plus adversarial shapes — truncations at awkward offsets,
  * corrupt signatures, fill-byte runs, a null payload. MultimodalSpec
  * separately pins the same functions against independent JVM parsers;
  * this spec pins that the r14 implementation swap changed nothing. */
class BinaryMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // adversarial payloads (hex): truncations, corrupt magic, deep walks
  private val craftedHex = Seq(
    "",                            // empty
    "FF",                          // 1 byte
    "FFD8",                        // bare SOI
    "FFD8FF",                      // SOI + fill start, truncated
    "FFD8FFFFFFFFFFC000110801000200030122000211010311 01".replace(" ", ""),
    "FFD8FFE000104A46494600010100000100010000FFC000110801000200" +
      "03012200021101031101",      // JFIF APP0 + SOF0 (the fixture arm)
    "FFD8FFE00010" + "00" * 14 + "FFC0",          // truncated mid-SOF
    "FFD8" + "FFE10004" + "0000" + "FFC2001108002000400301220002110103", // SOF2
    "FFD8" + ("FFE30004" + "0000") * 31 + "FFC0001108002000400301",      // deep walk
    "DEADBEEF00FFD8",              // red-herring SOI mid-payload
    "52494646",                    // RIFF only
    "524946461600000057454250",    // RIFF/WEBP, no chunk
    "52494646160000005745425056503820" + "0A000000" + "D00100" + "9D012A" + "40011001",
    "52494646160000005745425056503820" + "0A000000" + "D00100" + "9D012B" + "40011001", // bad sync
    "524946461100000057454250" + "5650384C" + "05000000" + "2F" + "47D1FF07",
    "524946461100000057454250" + "5650384C" + "05000000" + "30" + "47D1FF07", // bad sig
    "52494646160000005745425056503858" + "0A000000" + "00000000" + "3F0100" + "FF0000",
    "52494646160000005745425056503858" + "0A000000" + "00000000" + "3F01",    // truncated VP8X
    "524946460C00000057415645",    // RIFF/WAVE, no chunks
    "524946462400000057415645" + "666D7420" + "10000000" +
      "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000", // fmt only
    "524946462400000057415645" + "666D7420" + "10000000" +
      "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000" +
      "64617461" + "20000000",     // fmt + data (header-only clip)
    "524946462400000057415645" + "4C495354" + "06000000" + "494E464F" + "0000" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
      "0200" + "1000" + "64617461" + "11000000", // LIST before fmt, odd data size
    "424D" + "00" * 60,            // BM too short for dhash
    "424D" + "00" * 300            // BM long enough, all-zero pixels
  )

  private def payloads = {
    import spark.implicits._
    val crafted = craftedHex.toDF("hx").select(unhex(col("hx")).as("payload"))
    val nullRow = Seq(Option.empty[Array[Byte]]).toDF("payload")
    graft.queries.TextQueries.imagePayloads(spark, sf).select("payload")
      .unionByName(graft.queries.TextQueries.audioPayloads(spark, sf).select("payload"))
      .unionByName(crafted)
      .unionByName(nullRow)
  }

  private def assertSame(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                         struct: Boolean = true): Unit = {
    val df = payloads.select(a.as("a"), b.as("b"))
    val neq = if (struct) to_json(col("a")) =!= to_json(col("b"))
              else col("a") =!= col("b")
    val bad = df.filter((col("a").isNull =!= col("b").isNull) ||
      (col("a").isNotNull && neq))
    assert(bad.count() == 0, bad.take(3).mkString("; "))
  }

  test("compiled jpegDims ≡ Column fold (default and 8-segment budgets)") {
    assertSame(Multimodal.jpegDims(col("payload")),
      Multimodal.jpegDimsHof(col("payload")))
    assertSame(Multimodal.jpegDims(col("payload"), maxSegments = 8),
      Multimodal.jpegDimsHof(col("payload"), maxSegments = 8))
  }

  test("compiled webpDims ≡ Column spelling") {
    assertSame(Multimodal.webpDims(col("payload")),
      Multimodal.webpDimsHof(col("payload")))
  }

  test("compiled wavMeta ≡ Column walk") {
    assertSame(Multimodal.wavMeta(col("payload")),
      Multimodal.wavMetaHof(col("payload")))
  }

  test("compiled dhashHex ≡ Column spelling") {
    assertSame(Multimodal.dhashHex(col("payload")),
      Multimodal.dhashHexHof(col("payload")), struct = false)
  }
}
