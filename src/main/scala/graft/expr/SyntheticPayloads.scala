package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Compiled synthetic-payload constructors (r15) — the write-side twins of
  * [[BinaryMeta]]'s compiled readers.
  *
  * Motivation (optimization guide §1.2 step 2 + §4; VERDICT r14 #4): after
  * r14 compiled the payload READERS, q_pair_curation's and q_image_dhash's
  * residual cost was building the payloads — a CASE tower of
  * unhex/lpad/hex/concat per row (one string round trip per byte group),
  * inlined by CollapseProject into every consumer reference (five format
  * probes for the pair table, 128 byte probes for the BMP), still the
  * dominant term of both plans' Filter conditions. Each expression below
  * emits the exact bytes in one Java array fill, codegen-participating, so
  * whole-stage CSE collapses the repeated references too.
  *
  * Value-identity: byte-for-byte equal to the Column spellings (which
  * survive as the `*Hof` twins), pinned by SyntheticPayloadsSpec over the
  * full doc_id range of the fixture corpus plus adversarial ids (negative,
  * Long.MaxValue, every branch residue). Null contract: null-in → null-out,
  * exactly the Column spellings' behavior (every arm threads doc_id through
  * hex/unhex, so a null id nulls the payload there as well).
  */
object SyntheticPayloads {

  // ---- q_pair_curation's pair table ------------------------------------

  private val JpgPrefix = hexBytes("FFD8FFE000104A46494600010100000100010000FFC0001108")
  private val JpgSuffix = hexBytes("03012200021101031101")
  private val PngPrefix = hexBytes("89504E470D0A1A0A0000000D49484452")
  private val PngSuffix = hexBytes("0806000000")
  private val RawArm    = hexBytes("DEADBEEF00FFD8")
  private val WpVPrefix = hexBytes("52494646160000005745425056503820" + "0A000000" + "D00100" + "9D012A")
  private val WpLPrefix = hexBytes("524946461100000057454250" + "5650384C" + "05000000" + "2F")
  private val WpXPrefix = hexBytes("52494646160000005745425056503858" + "0A000000" + "00000000")

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  @inline private def gen(docId: Long, mult: Long): Int =
    (64L + Math.floorMod(docId * mult, 1984L)).toInt

  @inline private def be16(out: Array[Byte], o: Int, v: Int): Unit = {
    out(o) = (v >>> 8).toByte; out(o + 1) = v.toByte
  }

  @inline private def le(out: Array[Byte], o: Int, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out(o + i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  /** The q_pair_curation payload for one doc id — branch residues, width/
    * height generators and container layouts exactly as the Column tower
    * in [[graft.queries.TextQueries.pairCurationPayloadHof]]. */
  def pairPayload(docId: Long): Array[Byte] = {
    val w = gen(docId, 1L)
    if (Math.floorMod(docId, 17L) == 0L) RawArm.clone()
    else if (Math.floorMod(docId, 13L) == 0L) {
      val h = gen(docId, 11L)
      val out = new Array[Byte](JpgPrefix.length + 4 + JpgSuffix.length)
      System.arraycopy(JpgPrefix, 0, out, 0, JpgPrefix.length)
      be16(out, JpgPrefix.length, h); be16(out, JpgPrefix.length + 2, w)
      System.arraycopy(JpgSuffix, 0, out, JpgPrefix.length + 4, JpgSuffix.length)
      out
    } else if (Math.floorMod(docId, 19L) == 0L) {
      val h = gen(docId, 13L)
      val out = new Array[Byte](WpVPrefix.length + 4)
      System.arraycopy(WpVPrefix, 0, out, 0, WpVPrefix.length)
      le(out, WpVPrefix.length, w.toLong, 2); le(out, WpVPrefix.length + 2, h.toLong, 2)
      out
    } else if (Math.floorMod(docId, 23L) == 0L) {
      val h = gen(docId, 17L)
      val out = new Array[Byte](WpLPrefix.length + 4)
      System.arraycopy(WpLPrefix, 0, out, 0, WpLPrefix.length)
      le(out, WpLPrefix.length, (w - 1).toLong + (h - 1).toLong * 16384L, 4)
      out
    } else if (Math.floorMod(docId, 29L) == 0L) {
      val h = gen(docId, 19L)
      val out = new Array[Byte](WpXPrefix.length + 6)
      System.arraycopy(WpXPrefix, 0, out, 0, WpXPrefix.length)
      le(out, WpXPrefix.length, (w - 1).toLong, 3); le(out, WpXPrefix.length + 3, (h - 1).toLong, 3)
      out
    } else {
      val h = gen(docId, 7L)
      val out = new Array[Byte](PngPrefix.length + 8 + PngSuffix.length)
      System.arraycopy(PngPrefix, 0, out, 0, PngPrefix.length)
      // be32 of values < 2048: top two bytes stay 0
      be16(out, PngPrefix.length + 2, w); be16(out, PngPrefix.length + 6, h)
      System.arraycopy(PngSuffix, 0, out, PngPrefix.length + 8, PngSuffix.length)
      out
    }
  }

  // ---- q_image_dhash / q_binary_ingest's BMP ---------------------------

  private val BmpCols = 9
  private val BmpRows = 8
  private val BmpStride = 28
  private val BmpDataOffset = 54
  private val BmpHeader: Array[Byte] = {
    val fileSize = BmpDataOffset + BmpRows * BmpStride // 278
    def le32(v: Int) = (0 until 4).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString
    def le16h(v: Int) = (0 until 2).map(i => f"${(v >> (8 * i)) & 0xff}%02X").mkString
    hexBytes("424D" + le32(fileSize) + le32(0) + le32(BmpDataOffset) +
      le32(40) + le32(BmpCols) + le32(BmpRows) + le16h(1) + le16h(24) +
      le32(0) + le32(BmpRows * BmpStride) + le32(0) + le32(0) + le32(0) + le32(0))
  }

  /** The q_image_dhash BMP for one doc id — pixel formula, brightness
    * mirror rule and bottom-up row layout exactly as the Column spelling
    * in [[graft.queries.TextQueries.imagePayloadHof]]. */
  def imageBmp(docId: Long): Array[Byte] = {
    val mirror = Math.floorMod(docId, 5L) == 4L
    val base = if (mirror) docId - 1L else docId
    val bright = if (mirror) 2 else 0
    val out = new Array[Byte](BmpDataOffset + BmpRows * BmpStride)
    System.arraycopy(BmpHeader, 0, out, 0, BmpDataOffset)
    var yb = 0
    while (yb < BmpRows) {
      val y = BmpRows - 1 - yb // bottom-up storage
      val rowOff = BmpDataOffset + yb * BmpStride
      var x = 0
      while (x < BmpCols) {
        val v = (Math.floorMod(base * 37L + (x * 11 + y * 23).toLong +
          Math.floorMod(base * ((x + 3) * (y + 7)).toLong, 97L), 250L) + bright).toInt
        val o = rowOff + x * 3
        out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
        x += 1
      }
      // stride pad byte stays 0 (array init)
      yb += 1
    }
    out
  }
}

private[expr] abstract class LongToBinaryExpression extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint argument, got ${t.sql}")
  }
}

case class PairPayload(child: Expression) extends LongToBinaryExpression {
  override def prettyName: String = "pair_payload"
  protected override def nullSafeEval(input: Any): Any =
    SyntheticPayloads.pairPayload(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SyntheticPayloads.pairPayload($c)")
  override protected def withNewChildInternal(newChild: Expression): PairPayload =
    copy(child = newChild)
}

case class ImageBmp(child: Expression) extends LongToBinaryExpression {
  override def prettyName: String = "image_bmp"
  protected override def nullSafeEval(input: Any): Any =
    SyntheticPayloads.imageBmp(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SyntheticPayloads.imageBmp($c)")
  override protected def withNewChildInternal(newChild: Expression): ImageBmp =
    copy(child = newChild)
}
