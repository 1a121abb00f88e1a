package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric PQ distance (ADC) as a codegen-participating expression:
  * given a candidate's `array<int>` PQ codes and a query's full
  * `array<double>` vector, return the L2² distance between the query and
  * the candidate's RECONSTRUCTION — Σ over subspaces of the squared
  * distance from the query's subvector to the candidate's selected
  * codebook centroid. Only the selected centroid per subspace is touched
  * (m·(dim/m) = dim multiply-adds per pair), so no per-query lookup
  * table is needed.
  *
  * Same rationale as [[PqEncode]]: the HOF spelling instantiates per-row
  * interpreted lambda folds; this compiles to two plain Java loops over
  * the referenced codebook and runs inside the surrounding codegen span.
  * Accumulation is in strict subspace-then-dimension order (matches a
  * sequential fold for cross-engine parity).
  */
case class PqAdcDistance(left: Expression, right: Expression,
                         codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  private def m: Int = codebooks.length
  private def sub: Int = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<int> codes, array<double> query), " +
            s"got ${l.sql} and ${r.sql}")
    }

  private def k: Int = codebooks(0).length

  /** Runtime shape contract: unlike [[PqEncode]] (which produces its own
    * well-shaped output), this accepts arbitrary array columns — a
    * wrong-shaped input must fail loudly, not read out of bounds into
    * silently wrong distances. */
  private def shapeError(codesN: Int, queryN: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: need >= $m codes in [0,$k) and a query of >= ${m * sub} dims, " +
        s"got ${codesN} codes / ${queryN} dims")

  override protected def nullSafeEval(codesAny: Any, queryAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = queryAny.asInstanceOf[ArrayData]
    if (codes.numElements() < m || q.numElements() < m * sub)
      shapeError(codes.numElements(), q.numElements())
    var d = 0.0
    var mi = 0
    while (mi < m) {
      val code = codes.getInt(mi)
      if (code < 0 || code >= k) shapeError(codes.numElements(), q.numElements())
      val c = codebooks(mi)(code)
      var j = 0
      while (j < sub) {
        val diff = q.getDouble(mi * sub + j) - c(j)
        d += diff * diff
        j += 1
      }
      mi += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val d = ctx.freshName("d")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val diff = ctx.freshName("diff")
      val code = ctx.freshName("code")
      val refObj = ctx.addReferenceObj("pqAdcSelf", this, classOf[PqAdcDistance].getName)
      s"""
         |if ($codes.numElements() < $m || $q.numElements() < ${m * sub}) {
         |  $refObj.shapeErrorPublic($codes.numElements(), $q.numElements());
         |}
         |double $d = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  final int $code = $codes.getInt($mi);
         |  if ($code < 0 || $code >= $k) {
         |    $refObj.shapeErrorPublic($codes.numElements(), $q.numElements());
         |  }
         |  final double[] $c = $cbRef[$mi][$code];
         |  for (int $j = 0; $j < $sub; $j++) {
         |    final double $diff = $q.getDouble($mi * $sub + $j) - $c[$j];
         |    $d += $diff * $diff;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  /** Codegen entry for the shape guard (generated Java can't see the
    * private method). */
  def shapeErrorPublic(codesN: Int, queryN: Int): Unit = shapeError(codesN, queryN)

  /** Codebooks are an Array-of-Arrays case-class field, whose default
    * equals is reference identity — that defeats Catalyst canonicalization
    * (semanticEquals, common-subexpression elimination) for two textually
    * identical calls. Compare by deep value instead. */
  override def equals(other: Any): Boolean = other match {
    case that: PqAdcDistance =>
      left == that.left && right == that.right &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[AnyRef]], that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode + right.hashCode) +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

object PqAdcDistance {
  /** Column-API entry point: `pq_adc_distance(codes, queryVec, codebooks)`. */
  def pq_adc_distance(codes: Column, query: Column,
                      codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqAdcDistance(
      GraftBridge.expression(codes), GraftBridge.expression(query),
      codebooks.map(_.map(_.toArray).toArray).toArray))
}
