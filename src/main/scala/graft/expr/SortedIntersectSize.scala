package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `|A ∩ B|` of two PRE-SORTED, PRE-DEDUPLICATED arrays via a two-pointer
  * merge — a codegen-participating Catalyst expression.
  *
  * Motivation (set-similarity joins, e.g. [[graft.operators.Dedup]]): the
  * built-in route `size(array_union(a, b))` builds a hash set and an output
  * array PER PAIR — at `block²` pair counts the allocations dominate the
  * whole near-dup query. Sorting each document's token array once before the
  * pair join lets every pair be scored by a single allocation-free merge
  * scan: O(|A|+|B|) comparisons, no hash set, no output array, inside the
  * surrounding WholeStageCodegen span.
  *
  * Contract: both inputs ascending-sorted (`array_sort`) and duplicate-free
  * (`array_distinct`), no null elements — the producers in this library
  * (`TextFunctions.words`, `wordShingles`) guarantee all three.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  @transient private lazy val elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == r =>
        TypeUtils.checkForOrderingExpr(l, prettyName)
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two arrays of the same element type, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val c = ordering.compare(a.get(i, elementType), b.get(j, elementType))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val cmp = ctx.freshName("cmp")
      val jt = CodeGenerator.javaType(elementType)
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $na && $j < $nb) {
         |  $jt $x = ${CodeGenerator.getValue(a, elementType, i)};
         |  $jt $y = ${CodeGenerator.getValue(b, elementType, j)};
         |  int $cmp = ${ctx.genComp(elementType, x, y)};
         |  if ($cmp == 0) { $n++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-API entry point: `sorted_intersect_size($"a", $"b")`. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
