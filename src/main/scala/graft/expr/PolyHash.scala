package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The library's polynomial string hash — `h = (h·31 + codePoint) mod
  * (2³¹−1)` folded left over the string's code points, seed 0 — as a
  * codegen-participating Catalyst expression.
  *
  * Motivation: the original HOF spelling (`aggregate(split(s, ""), 0L,
  * (h, c) => pmod(h*31 + ascii(c), p))`) allocates a per-CHARACTER array
  * and dispatches two interpreted lambdas per character; hashing every
  * shingle of every document that way dominated q_delta_dedup's 100×-tier
  * profile (and is the per-row constant in q_minhash_arith / q_winnow /
  * q_dsir_weights). This expression computes the identical value in one
  * tight loop — PolyHashSpec pins value equality against the HOF spelling
  * on the real corpus, and the DuckDB oracles (a `list_reduce` over
  * `string_split(s, '')`) are unchanged.
  *
  * Code-point semantics: Java-8+ `split("")` does not cut surrogate
  * pairs, and `ascii()` returns `codePointAt(0)` of each chunk, so the
  * HOF folds CODE POINTS — the loop below iterates the same way
  * (`codePointAt` + `Character.charCount`), not UTF-16 units. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private val P = 2147483647L // 2^31 - 1 (Mersenne) — Dedup.Prime

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-API entry point: `poly_hash($"s")`. */
  def poly_hash(s: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(s)))
}
