package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position word-shingle [[PolyHash]]es of a text, in ONE compiled pass
  * — the from-text fusion of `transform(wordShingles(text, n), polyHash)`.
  *
  * Motivation (optimization guide §1.2 step 2): the HOF spelling pays, per
  * document, a regex `split`, a `when`/`size` guard, a `sequence` index
  * array, an interpreted `transform` lambda whose body allocates a `slice`
  * array AND a `concat_ws` string per shingle, an `array_distinct` hash
  * set, and a second interpreted `transform` for the hash — ~5 array/string
  * allocations and 2 lambda dispatches per shingle. This expression folds
  * the [[PolyHash]] code-point arithmetic directly over the text's shingle
  * SPANS (split on a single space and re-joined with a single space, a
  * consecutive word run IS the original character span), so the whole
  * computation is one scan of the string plus one output array.
  *
  * CONTRACT — multiset, not set: unlike `wordShingles`, duplicate shingles
  * are NOT removed (one hash per shingle position, in position order).
  * Every consumer is duplicate-insensitive or position-keyed by
  * construction: signature minima ([[MinhashSigs]] — min over a multiset
  * equals min over its set), sorted-DISTINCT hash sets
  * (`array_sort(array_distinct(hsh))` — string dedup before hashing and
  * hash dedup after commute, because equal strings hash equal), and the
  * winnowing gram stream (positioned by definition). ShingleHashesSpec
  * pins the consumer identities against the HOF spellings on the real
  * corpus plus crafted edge cases.
  *
  * Short-text fallback, per consumer contract: `emptyIfShort = false`
  * (the `wordShingles` convention — MinHash wants every doc to have ≥1
  * shingle) hashes the whole text as one shingle when it has < n words;
  * `emptyIfShort = true` (the winnowing convention) yields an empty array.
  *
  * Null contract: null text → null (nullSafeEval). */
case class ShingleHashes(child: Expression, n: Int,
                         emptyIfShort: Boolean = false) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, emptyIfShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.ShingleHashes.compute($c, $n, $emptyIfShort)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val P = 2147483647L // 2^31 - 1 (Mersenne) — Dedup.Prime

  /** [[PolyHash.compute]] over the code points of `str[from, until)`. */
  private def spanHash(str: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Shared by the interpreted and generated paths. */
  def compute(text: UTF8String, n: Int, emptyIfShort: Boolean): GenericArrayData = {
    val str = text.toString
    val len = str.length
    // word starts under split-on-single-space semantics (limit -1: empty
    // words from leading/trailing/consecutive spaces are words too)
    var spaces = 0
    var i = 0
    while (i < len) { if (str.charAt(i) == ' ') spaces += 1; i += 1 }
    val wc = spaces + 1
    if (wc < n)
      return if (emptyIfShort) Empty
      else new GenericArrayData(Array(spanHash(str, 0, len)))
    val starts = new Array[Int](wc + 1) // starts(k) = char index of word k
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(wc) = len + 1 // sentinel: "start of word wc", one past the end
    val m = wc - n + 1
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      // shingle k = words k..k+n-1 joined by ' ' = the exact original span
      out(k) = spanHash(str, starts(k), starts(k + n) - 1)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: `shingle_hashes($"text", 3)`. */
  def shingle_hashes(text: Column, n: Int, emptyIfShort: Boolean = false): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n, emptyIfShort))
}
