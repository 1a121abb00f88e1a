package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled binary-header metadata expressions (r14) — the byte-walk twins
  * of [[graft.operators.Multimodal]]'s pure-Column spellings.
  *
  * Motivation (optimization guide §1.2 step 2 + §4): the Column spellings
  * read every byte as `conv(hex(substr(payload, o, 1)), 16, 10)` — a
  * string allocation and a base conversion per byte — and the JPEG/WAV
  * walks run as interpreted `aggregate` HOFs (a struct allocation and a
  * ~10-node CaseWhen per step per row, outside codegen). q_pair_curation
  * evaluates TWO of these walks per row and referenced each 3× from the
  * final projection; the interpreted-HOF stack made it the slowest row of
  * the r14-pre bench (10.2 s vs 1.5 s in r13). Each expression below is
  * one tight Java loop over the payload bytes, codegen-participating, so
  * whole-stage codegen's subexpression elimination also collapses the
  * repeated references.
  *
  * Value-identity: the walk semantics (offsets, guards, truncation
  * behavior, step budgets) mirror the Column spellings exactly;
  * MultimodalSpec pins every function against an INDEPENDENT JVM
  * reference (`parseDims`, `dhashHexOfImage`, the JDK's own WAV parser)
  * on every header shape, and BinaryMetaSpec pins compiled ≡ Column-HOF
  * on the real fixture payloads plus truncation edges. Null contract:
  * these expressions are null-in → null-out; [[graft.operators.Multimodal]]
  * wraps them in `coalesce(..., <all-null struct>)` to reproduce the
  * Column spellings' null-payload outputs (a non-null struct of nulls /
  * the all-zero dhash string).
  */
object BinaryMeta {

  val DimsType: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType)))

  val WavType: StructType = StructType(Seq(
    StructField("channels", IntegerType), StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType), StructField("n_frames", LongType)))

  @inline private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
  @inline private def be16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)
  @inline private def le16(p: Array[Byte], i: Int): Long = u8(p, i) | (u8(p, i + 1) << 8)
  @inline private def le24(p: Array[Byte], i: Int): Int =
    u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16)
  @inline private def le32(p: Array[Byte], i: Int): Long =
    u8(p, i).toLong | (u8(p, i + 1).toLong << 8) |
      (u8(p, i + 2).toLong << 16) | (u8(p, i + 3).toLong << 24)
  @inline private def tag4(p: Array[Byte], i: Int, a: Char, b: Char, c: Char, d: Char): Boolean =
    p(i) == a.toByte && p(i + 1) == b.toByte && p(i + 2) == c.toByte && p(i + 3) == d.toByte

  /** The `Multimodal.jpegDims` marker walk: SOI gate, then up to
    * `maxSegments` transition steps (fill-byte skip, standalone-marker
    * hop, length-field hop, SOF stop), mirroring the Column fold
    * state-for-state. */
  def jpegDims(p: Array[Byte], maxSegments: Int): InternalRow = {
    val len = p.length
    val out = new GenericInternalRow(2)
    if (len < 2 || u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return out // not JPEG: (null, null)
    var off = 2
    var dead = false
    var found = false
    var step = 0
    while (step < maxSegments && !dead && !found) {
      if (off + 4 > len || u8(p, off) != 0xff) dead = true
      else {
        val marker = u8(p, off + 1)
        if (marker == 0xff) off += 1 // one fill byte per step, as the fold
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) off += 2
        else {
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof && off + 9 <= len) {
            out.setInt(0, be16(p, off + 7)) // w
            out.setInt(1, be16(p, off + 5)) // h
            found = true
          } else if (isSof) dead = true // truncated SOF
          else off += 2 + be16(p, off + 2)
        }
      }
      step += 1
    }
    out
  }

  /** The `Multimodal.webpDims` fixed-offset parse: RIFF/WEBP gate, then
    * the per-variant ("VP8 " / "VP8L" / "VP8X") arithmetic. */
  def webpDims(p: Array[Byte]): InternalRow = {
    val len = p.length
    val out = new GenericInternalRow(2)
    if (len < 25 || !tag4(p, 0, 'R', 'I', 'F', 'F') || !tag4(p, 8, 'W', 'E', 'B', 'P'))
      return out
    if (tag4(p, 12, 'V', 'P', '8', ' ')) {
      if (len >= 30 && u8(p, 23) == 0x9d && u8(p, 24) == 0x01 && u8(p, 25) == 0x2a) {
        out.setInt(0, (le16(p, 26) & 0x3fff).toInt)
        out.setInt(1, (le16(p, 28) & 0x3fff).toInt)
      }
    } else if (tag4(p, 12, 'V', 'P', '8', 'L')) {
      if (u8(p, 20) == 0x2f) {
        val b = le32(p, 21)
        out.setInt(0, ((b & 0x3fff) + 1).toInt)
        out.setInt(1, (((b >> 14) & 0x3fff) + 1).toInt)
      }
    } else if (tag4(p, 12, 'V', 'P', '8', 'X')) {
      if (len >= 30) {
        out.setInt(0, le24(p, 24) + 1)
        out.setInt(1, le24(p, 27) + 1)
      }
    }
    out
  }

  /** The `Multimodal.wavMeta` bounded chunk walk: RIFF/WAVE gate, 8 chunk
    * hops (word-aligned), `fmt ` fields overwrite, `data` size kept,
    * n_frames = floor(dsize / balign) when balign > 0. */
  def wavMeta(p: Array[Byte]): InternalRow = {
    val len = p.length.toLong
    val out = new GenericInternalRow(4)
    if (len < 12 || !tag4(p, 0, 'R', 'I', 'F', 'F') || !tag4(p, 8, 'W', 'A', 'V', 'E'))
      return out
    var off = 12L
    var ch = -1L; var rate = -1L; var bits = -1L; var balign = -1L; var dsize = -1L
    var step = 0
    while (step < 8) {
      if (off + 8L <= len) {
        val o = off.toInt // off+8 <= len (an Int), so the cast is exact
        val csize = le32(p, o + 4)
        if (tag4(p, o, 'f', 'm', 't', ' ') && off + 24L <= len) {
          ch = le16(p, o + 10); rate = le32(p, o + 12)
          bits = le16(p, o + 22); balign = le16(p, o + 20)
        } else if (tag4(p, o, 'd', 'a', 't', 'a')) dsize = csize
        off = off + 8L + csize + (csize % 2L)
      }
      step += 1
    }
    if (ch >= 0) out.setInt(0, ch.toInt)
    if (rate >= 0) out.setInt(1, rate.toInt)
    if (bits >= 0) out.setInt(2, bits.toInt)
    if (balign > 0 && dsize >= 0) out.setLong(3, (dsize - dsize % balign) / balign)
    out
  }

  /** The `Multimodal.dhashHex` 9×8 BMP perceptual hash: 64 left-vs-right
    * luma comparisons read straight from the pixel bytes; a comparison
    * whose byte lies past the payload contributes a 0 bit (the Column
    * spelling's null-comparison → `otherwise(0)` behavior). */
  def dhashHex(p: Array[Byte]): UTF8String = {
    val len = p.length
    val chars = new Array[Byte](16)
    val hex = "0123456789abcdef"
    var k = 0
    while (k < 16) {
      var v = 0
      var j = 0
      while (j < 4) {
        val idx = 4 * k + j
        val y = idx / 8; val x = idx % 8
        val base = 54 + (7 - y) * 28
        val a = base + x * 3
        val b = base + (x + 1) * 3
        if (b < len && u8(p, a) > u8(p, b)) v |= (1 << j)
        j += 1
      }
      chars(k) = hex.charAt(v).toByte
      k += 1
    }
    UTF8String.fromBytes(chars)
  }
}

private[expr] abstract class BinaryMetaExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary argument, got ${t.sql}")
  }
}

case class JpegDims(child: Expression, maxSegments: Int) extends BinaryMetaExpression {
  override def dataType: DataType = BinaryMeta.DimsType
  override def prettyName: String = "jpeg_dims"
  protected override def nullSafeEval(input: Any): Any =
    BinaryMeta.jpegDims(input.asInstanceOf[Array[Byte]], maxSegments)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BinaryMeta.jpegDims($c, $maxSegments)")
  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

case class WebpDims(child: Expression) extends BinaryMetaExpression {
  override def dataType: DataType = BinaryMeta.DimsType
  override def prettyName: String = "webp_dims"
  protected override def nullSafeEval(input: Any): Any =
    BinaryMeta.webpDims(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BinaryMeta.webpDims($c)")
  override protected def withNewChildInternal(newChild: Expression): WebpDims =
    copy(child = newChild)
}

case class WavMeta(child: Expression) extends BinaryMetaExpression {
  override def dataType: DataType = BinaryMeta.WavType
  override def prettyName: String = "wav_meta"
  protected override def nullSafeEval(input: Any): Any =
    BinaryMeta.wavMeta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BinaryMeta.wavMeta($c)")
  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

case class DhashHex(child: Expression) extends BinaryMetaExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "dhash_hex"
  protected override def nullSafeEval(input: Any): Any =
    BinaryMeta.dhashHex(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BinaryMeta.dhashHex($c)")
  override protected def withNewChildInternal(newChild: Expression): DhashHex =
    copy(child = newChild)
}
