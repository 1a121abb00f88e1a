package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for corpus ingestion — the first transform
  * every LLM training pipeline applies before hashing, deduplicating or
  * tokenizing raw text (CCNet/ RefinedWeb / Dolma all NFC-normalize first;
  * two byte-different spellings of the same grapheme otherwise defeat every
  * downstream fingerprint):
  *
  *   1. Unicode NFC normalization (combining sequences compose:
  *      `e` + U+0301 → `é`), via `java.text.Normalizer` — the composition
  *      tables for Latin/Greek/Cyrillic have been stable since Unicode 1.1
  *      and the W3C normalization-stability policy freezes them, so JDK
  *      and utf8proc (the DuckDB oracle) agree;
  *   2. C0 control characters and DEL (`<= 0x1F`, `0x7F`) each become one
  *      space;
  *   3. runs of spaces collapse to a single space;
  *   4. leading/trailing spaces trim.
  *
  * Exactly equivalent to the oracle spelling
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))` — steps 2-4 fuse into
  * one pass below. A codegen-participating expression (not a UDF): the
  * whole normalize→hash chain stays inside WholeStageCodegen, and at
  * 100 TB this runs once per raw document on the ingest scan, so the
  * per-row constant is the corpus constant.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and is
  * true for almost all real text (ASCII and already-composed UTF-8), so
  * the NFC step only pays for documents that actually need recomposition.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  import java.text.Normalizer

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    // strip controls → collapse space runs → trim, fused in one pass:
    // a pending space is emitted only when a non-space character follows it
    // and at least one non-space character precedes it.
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var sawCtl = false // a control->space substitution preserves length
    var i = 0
    while (i < n) {
      val ch = nfc.charAt(i)
      if (ch <= '\u001f' || ch == '\u007f' || ch == ' ') {
        if (ch != ' ') sawCtl = true
        pendingSpace = started
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
        started = true
      }
      i += 1
    }
    // reuse the input buffer only when provably identity: NFC returned the
    // same instance AND no control was rewritten AND nothing was dropped
    if ((nfc eq raw) && !sawCtl && sb.length == n) s
    else UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point: `normalize_text($"text")`. */
  def normalize_text(s: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(s)))
}
