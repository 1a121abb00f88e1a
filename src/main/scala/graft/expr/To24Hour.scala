package graft.expr

import java.time.LocalDateTime
import java.time.format.{DateTimeFormatter, ResolverStyle}
import java.util.Locale

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst rewrite of the reference's only UDF
  * (`ETL_Pipeline_Batch/transform.py:8-23`, `convert_to_24h_format`):
  * `"MM/dd/yyyy hh:mm:ss AM|PM"` → `"MM/dd/yyyy HH:mm:ss"`, returning the
  * input **unchanged** on any parse failure (the reference swallows every
  * exception and falls through — SURVEY §2.9.4).
  *
  * In the reference this is a Python UDF, which forces every row through a
  * `BatchEvalPython` worker round-trip and blocks whole-stage codegen — the
  * single biggest per-row cost in its batch pipeline (SURVEY §3.1). Here it
  * is a codegen-participating unary expression: `doGenCode` emits a static
  * call, so the projection containing it stays inside one WholeStageCodegen
  * span.
  */
case class To24Hour(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "to_24h"

  override protected def nullSafeEval(input: Any): Any =
    To24Hour.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.To24Hour.convert($c)")

  override protected def withNewChildInternal(newChild: Expression): To24Hour =
    copy(child = newChild)
}

object To24Hour {
  // Strict resolver + explicit locale: "13:00:00 PM" or "02/30/…" must fail
  // (→ passthrough), exactly like Python's datetime.strptime in the reference.
  // 'uuuu' is the STRICT-mode year field (yyyy is year-of-era and rejects
  // strict parsing without an era marker).
  private val InFmt =
    DateTimeFormatter.ofPattern("MM/dd/uuuu hh:mm:ss a", Locale.US)
      .withResolverStyle(ResolverStyle.STRICT)
  private val OutFmt =
    DateTimeFormatter.ofPattern("MM/dd/uuuu HH:mm:ss", Locale.US)

  /** Pure-function twin (used by tests and the udf fallback path). */
  def to24h(s: String): String =
    try LocalDateTime.parse(s, InFmt).format(OutFmt)
    catch { case NonFatal(_) => s }

  /** Called from both interpreted eval and generated code. */
  def convert(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = to24h(str)
    if (out eq str) s else UTF8String.fromString(out)
  }

  /** Column-API entry point: `to_24h($"raw_time")`. */
  def to_24h(c: Column): Column =
    GraftBridge.column(To24Hour(GraftBridge.expression(c)))
}
