package graft.expr

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst rewrite of the reference's only UDF
  * (`ETL_Pipeline_Batch/transform.py:8-21`, `convert_to_24_hour`):
  * `"<date> hh:mm:ss AM|PM"` → `"<date> HH:mm:ss"`, returning the input
  * **unchanged** on any error (the reference swallows every exception and
  * falls through — SURVEY §2.9.4).
  *
  * The reference does NOT parse a timestamp — it is a bare string rewrite:
  * split on single spaces into exactly (date, time, period), split the time
  * on ':' into exactly three fields, then `int(hours) + 12` when period is
  * `"PM"` and the hour literal isn't `"12"`, or `"00"` when it is `"12 AM"`.
  * Nothing else is validated: non-zero-padded hours convert ("1:05:00 PM" →
  * "13:05:00"), impossible dates and minutes are rebuilt verbatim, and the
  * rebuilt string always drops the period suffix. Downstream `to_timestamp`
  * is the actual validity gate in both pipelines. Replicated here branch for
  * branch (divergence pinned in To24HourSpec).
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

  /** Pure-function twin of `convert_to_24_hour` (transform.py:8-21), used by
    * tests and the udf fallback path. One knowing divergence: Python's
    * `int()` also accepts underscores/unicode digits; `toInt` does not and
    * such rows pass through instead — unreachable for the CAD corpus. */
  def to24h(s: String): String = {
    if (s == null || s.isEmpty) return s
    val parts = s.split(" ", -1)
    if (parts.length != 3) return s
    val time = parts(1).split(":", -1)
    if (time.length != 3) return s
    try {
      val hours =
        if (parts(2) == "PM" && time(0) != "12") (time(0).trim.toInt + 12).toString
        else if (parts(2) == "AM" && time(0) == "12") "00"
        else time(0)
      s"${parts(0)} $hours:${time(1)}:${time(2)}"
    } catch { case NonFatal(_) => s }
  }

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
