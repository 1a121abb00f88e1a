package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 32-bit SimHash of a text in ONE compiled pass — the
  * from-text fusion of `Dedup.arithSimhash32`'s HOF spelling.
  *
  * Motivation (optimization guide §1.2 step 2): the HOF spelling pays, per
  * WORD, an interpreted `aggregate` step whose body is a `zip_with` over a
  * 32-element accumulator against a `sequence(0, 31)` — i.e. a fresh
  * 32-element array allocation plus 32 interpreted `when`/shift
  * expressions per word, then a second 32-step interpreted fold for the
  * sign→bit reduction. This expression computes the identical value with
  * one [[PolyHash]] code-point fold per word and a 32-iteration primitive
  * inner loop on a local array: no allocations, no lambdas.
  *
  * Value-identity with the HOF spelling (Simhash32Spec pins it on the real
  * corpus plus crafted edge cases; the generated per-bit DuckDB oracle is
  * unchanged): words are split-on-single-space with limit -1 (empty words
  * from leading/trailing/consecutive spaces hash to 0 and contribute −1 to
  * every bit, exactly as `transform(split(text, " "), polyHash)` does);
  * frequency weighting is inherent (no dedup); bit b of the result is set
  * iff the signed word-count sum for bit b is strictly positive.
  *
  * Null contract: null text → null; empty text is one empty word → all
  * sums −1 → 0L (matching the HOF). */
case class Simhash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    Simhash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Simhash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  private val P = 2147483647L // 2^31 - 1 (Mersenne) — Dedup.Prime
  private val Bits = 32

  /** Shared by the interpreted and generated paths. */
  def compute(text: UTF8String): Long = {
    val str = text.toString
    val len = str.length
    val sums = new Array[Int](Bits)
    var h = 0L // running PolyHash of the current word
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        // word boundary: fold this word's hash into the 32 bit-sums
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
        h = 0L
        i += 1
      } else {
        val cp = str.codePointAt(i)
        h = (h * 31L + cp) % P
        i += Character.charCount(cp)
      }
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point: `simhash32($"text")`. */
  def simhash32(text: Column): Column =
    GraftBridge.column(Simhash32(GraftBridge.expression(text)))
}
