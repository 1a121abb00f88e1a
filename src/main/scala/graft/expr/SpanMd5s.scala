package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position word-n-gram MD5 digests of a text, in ONE compiled pass —
  * the from-text fusion of `unhex(md5(concat_ws(" ", slice(split(text,
  * " "), pos + 1, n))))` over an exploded position sequence (and, in
  * distinct mode, of `explode(array_distinct(wordShinglesStrict(text, n)))
  * → unhex(md5(...))`).
  *
  * Motivation (optimization guide §1.2 step 2): the Column spelling
  * re-splits the text and allocates a slice array plus a concatenated span
  * STRING per position before digesting it. A word n-gram re-joined with
  * single spaces IS a contiguous byte range of the original text
  * (split-on-single-space semantics; the space byte 0x20 never occurs
  * inside a multi-byte UTF-8 sequence), so this expression walks the
  * text's UTF-8 bytes once, finds the word boundaries, and feeds each
  * span's byte range straight into a thread-local MD5 — zero intermediate
  * arrays or strings.
  *
  * Semantics, mirrored from the consumers (SpanMd5sSpec pins each):
  *   - `stride = 1`: one digest per sliding position 0..wc−n (the
  *     substring-dedup / source-overlap gram stream, position = array
  *     index under `posexplode`);
  *   - `stride = n`: one digest per ALIGNED full window (paraDedup's
  *     passages; window w covers words w·n..w·n+n−1);
  *   - `distinct = true` (with stride 1): first-occurrence-ordered dedup
  *     BY DIGEST — value-identical to wordShinglesStrict's string-level
  *     `array_distinct` under the repo-wide md5-collision-freeness
  *     assumption (equal strings ⇔ equal digests), since consumers join
  *     and count on the digest itself;
  *   - texts with < n words yield an EMPTY array (the STRICT contract —
  *     every consumer here either pre-filters them or treats the doc as
  *     contributing no grams); null text → null. */
case class SpanMd5s(child: Expression, n: Int, stride: Int,
                    distinct: Boolean) extends UnaryExpression {
  require(n >= 1 && stride >= 1, s"need n >= 1, stride >= 1; got n=$n stride=$stride")
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "span_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    SpanMd5s.compute(input.asInstanceOf[UTF8String], n, stride, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.SpanMd5s.compute($c, $n, $stride, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): SpanMd5s =
    copy(child = newChild)
}

object SpanMd5s {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by the interpreted and generated paths. */
  def compute(text: UTF8String, n: Int, stride: Int,
              distinct: Boolean): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // word-start byte offsets under split-on-single-space semantics
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    val wc = spaces + 1
    if (wc < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](wc + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(wc) = len + 1 // sentinel: one past a virtual trailing space
    val md = digest.get()
    val count = (wc - n) / stride + 1
    val out = new Array[Any](count)
    val seen = if (distinct) new java.util.HashSet[java.nio.ByteBuffer]() else null
    var outN = 0
    var k = 0
    while (k < count) {
      val p = k * stride
      val from = starts(p)
      val until = starts(p + n) - 1
      md.reset()
      md.update(bytes, from, until - from)
      val h = md.digest()
      if (seen == null || seen.add(java.nio.ByteBuffer.wrap(h))) {
        out(outN) = h
        outN += 1
      }
      k += 1
    }
    if (outN == count) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], outN))
  }

  /** Column-API entry point. */
  def span_md5s(text: Column, n: Int, stride: Int = 1,
                distinct: Boolean = false): Column =
    GraftBridge.column(SpanMd5s(GraftBridge.expression(text), n, stride, distinct))
}
