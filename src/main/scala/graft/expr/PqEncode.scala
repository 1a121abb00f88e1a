package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode as a codegen-participating Catalyst
  * expression: for an `array<double>` vector of dim `m·sub`, emit the
  * `array<int>` of per-subspace nearest-codebook-entry indexes (L2²,
  * ties → lowest code, accumulation in strict array order so the result
  * is bit-compatible with any engine that folds sequentially).
  *
  * Why an Expression and not `transform`/`zip_with` composition: the
  * HOF formulation instantiates m·K interpreted lambda folds PER ROW
  * (higher-order functions never enter whole-stage codegen) — measured
  * ~2.8 ms/row at m=8, K=16. This expression compiles to three plain
  * Java loops over a referenced codebook object: the 1024 multiply-adds
  * run at arithmetic speed inside the surrounding codegen span.
  *
  * Contract: input length == m·sub (codebook shape), finite values, no
  * null elements. Codebook is bounded (m·K·sub doubles) and ships with
  * the serialized expression exactly like a literal.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def m: Int = codebooks.length
  private def k: Int = codebooks(0).length
  private def sub: Int = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (m > 0 && k > 0 && sub > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: empty codebook")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<double>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cbm = codebooks(mi)
      var best = Double.PositiveInfinity
      var bestK = 0
      var ki = 0
      while (ki < k) {
        val c = cbm(ki)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val diff = v.getDouble(mi * sub + j) - c(j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bestK = ki } // strict < : ties keep lowest code
        ki += 1
      }
      codes(mi) = bestK
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val cbm = ctx.freshName("cbm")
      val c = ctx.freshName("c")
      s"""
         |final int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  final double[][] $cbm = $cbRef[$mi];
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestK = 0;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    final double[] $c = $cbm[$ki];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      final double $diff = $v.getDouble($mi * $sub + $j) - $c[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bestK = $ki; }
         |  }
         |  $codes[$mi] = $bestK;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  /** Codebooks are an Array-of-Arrays case-class field, whose default
    * equals is reference identity — that defeats Catalyst canonicalization
    * (semanticEquals, common-subexpression elimination) for two textually
    * identical calls. Compare by deep value instead. */
  override def equals(other: Any): Boolean = other match {
    case that: PqEncode =>
      child == that.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]], that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])
}

object PqEncode {
  /** Column-API entry point: `pq_encode(vec, codebooks)`. */
  def pq_encode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v),
      codebooks.map(_.map(_.toArray).toArray).toArray))
}
