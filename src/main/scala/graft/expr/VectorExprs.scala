package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sequential-fold dot product of two `array<double>` columns as a
  * codegen-participating expression.
  *
  * Bit-identical to `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — the
  * same multiply-add sequence in the same index order — but the loop is
  * compiled code instead of per-element interpreted lambdas (higher-order
  * functions never enter whole-stage codegen; at 64 dims the HOF spelling
  * costs ~100 allocations+dispatches per pair). Mismatched lengths return
  * null, matching `zip_with`'s null-padding → null-propagating fold. */
case class SeqDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seq_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double>, got ${l.sql} and ${r.sql}")
    }

  /** Shared by interpreted eval and the generated code (one virtual call
    * per row; the loop itself is JIT-compiled — same speed as inlining).
    * A null ELEMENT nulls the result, exactly as the HOF fold would
    * (null product poisons the running sum). */
  def dot(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var d = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        d += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
      java.lang.Double.valueOf(d)
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = dot(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val refObj = ctx.addReferenceObj("seqDot", this, classOf[SeqDot].getName)
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $refObj.dot($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeqDot =
    copy(left = l, right = r)
}

object SeqDot {
  def seq_dot(a: Column, b: Column): Column =
    GraftBridge.column(SeqDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Top-`n` nearest IVF cells of an `array<double>` vector as a codegen-
  * participating expression: for each centroid, score = sequential-fold
  * dot(vec, centroid) / centroidNorm (the row's own norm scales every cell
  * equally, so it never changes the ranking); emit the cell ids of the `n`
  * best scores, ordered (score DESC, cell_id ASC — ties to the lowest id).
  *
  * Replaces the `transform` + `aggregate` + `array_sort` HOF pipeline that
  * performed C·dim interpreted lambda evaluations per row — at C = √N
  * scale (447 cells on the 100× tier) that interpretation overhead was
  * ~100× the arithmetic cost. Scoring here is the identical multiply-add
  * sequence (bit-identical scores, same tie-breaking), in compiled loops.
  *
  * The centroid table rides along as one bounded reference object
  * (C · dim doubles), exactly like [[PqEncode]]'s codebooks. Double
  * comparison uses `java.lang.Double.compare` — NaN ranks above every
  * finite score, matching Spark's SQL ordering for the HOF pipeline this
  * replaces. */
case class NearestCells(child: Expression, cellIds: Array[Long],
                        centroids: Array[Array[Double]], norms: Array[Double],
                        n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def c: Int = cellIds.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (c > 0 && n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: empty centroid table or n <= 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.sql}")
  }

  /** Shared by interpreted eval and generated code. A vector whose length
    * differs from the centroids' fails LOUDLY — a truncated dot product
    * would assign to silently wrong cells (the PqAdcDistance lesson). */
  def assign(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val keep = math.min(n, c)
    val topIds = new Array[Long](keep)
    val topSims = new Array[Double](keep)
    var filled = 0
    var ci = 0
    while (ci < c) {
      val cent = centroids(ci)
      if (cent.length != dim)
        throw new IllegalArgumentException(
          s"$prettyName: vector has $dim dims but centroid ${cellIds(ci)} has ${cent.length}")
      var d = 0.0
      var j = 0
      while (j < dim) { d += v.getDouble(j) * cent(j); j += 1 }
      val s = d / norms(ci)
      val id = cellIds(ci)
      // insertion position: before the first entry this score beats
      // (score DESC, id ASC); centroids arrive id-sorted so equal scores
      // keep ascending-id order by never displacing an equal predecessor
      if (filled < keep || java.lang.Double.compare(s, topSims(keep - 1)) > 0) {
        var pos = if (filled < keep) filled else keep - 1
        while (pos > 0 && java.lang.Double.compare(s, topSims(pos - 1)) > 0) {
          if (pos < keep) { topSims(pos) = topSims(pos - 1); topIds(pos) = topIds(pos - 1) }
          pos -= 1
        }
        topSims(pos) = s
        topIds(pos) = id
        if (filled < keep) filled += 1
      }
      ci += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topIds, filled))
  }

  override protected def nullSafeEval(v: Any): Any = assign(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val refObj = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $refObj.assign($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  /** Centroid arrays are case-class fields — deep-value equality so
    * identical calls canonicalize equal (same rationale as [[PqEncode]]). */
  override def equals(other: Any): Boolean = other match {
    case that: NearestCells =>
      child == that.child && n == that.n &&
        java.util.Arrays.equals(cellIds, that.cellIds) &&
        java.util.Arrays.equals(norms, that.norms) &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]], that.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode + n) + java.util.Arrays.hashCode(cellIds)) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])
}

object NearestCells {
  /** `nearest_cells(vec, cells, n)` — top-n cell ids (score DESC, id ASC).
    * `cells` = (cell_id, centroid, centroidNorm). Sorted by id here: the
    * tie-break relies on equal scores arriving in ascending-id order
    * (an equal score never displaces its predecessor), so the sort is a
    * correctness precondition, not a convention. */
  def nearest_cells(v: Column, cells: Seq[(Long, Seq[Double], Double)], n: Int): Column = {
    val sorted = cells.sortBy(_._1)
    GraftBridge.column(NearestCells(GraftBridge.expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray,
      sorted.map(_._3).toArray, n))
  }
}
