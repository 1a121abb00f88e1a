package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All 8 arithmetic-MinHash signatures of a shingle array in ONE compiled
  * pass — `sig_i = min over shingles of (polyHash(s)·a_i + b_i) mod p`
  * with the [[graft.operators.Dedup.arithPerms]] constants.
  *
  * Motivation: the HOF spelling materializes a per-document hash array
  * (`transform(shingles, polyHash)`) and then runs EIGHT interpreted
  * `transform` + `array_min` passes over it — ~8·|shingles| lambda
  * dispatches and 9 array allocations per document. This expression folds
  * each shingle's [[PolyHash]] into 8 running minima in a single loop:
  * no intermediate arrays, no lambdas. Value-identical (same arithmetic,
  * min is order-free) — MinhashSigsSpec pins equality against the HOF
  * columns on the real corpus; the DuckDB oracles are unchanged.
  *
  * Null/empty contract, matching `array_min(transform(...))`: null
  * elements are skipped; an empty (or all-null) shingle array yields a
  * null result (array_min of empty is null). The library's producers
  * ([[graft.functions.TextFunctions.wordShingles]]) never emit either. */
case class MinhashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  /** Always nullable: an empty (or all-null) shingle array yields a null
    * result REGARDLESS of the child's nullability — inheriting
    * `child.nullable` (the UnaryExpression default) violated the contract
    * for non-nullable children (array() literals, typed Dataset schemas):
    * collect() threw EXPRESSION_DECODING_FAILED and the optimizer folded
    * IS NULL checks away (spec-pinned). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> (shingles) or array<long> " +
        s"(pre-computed polyHashes), got ${t.sql}")
  }

  private def fromHashes: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  protected override def nullSafeEval(input: Any): Any =
    if (fromHashes) MinhashSigs.computeFromHashes(input.asInstanceOf[ArrayData])
    else MinhashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val m = if (fromHashes) "computeFromHashes" else "compute"
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sigs")
      s"""
         |$resultType $r = graft.expr.MinhashSigs.$m($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  private val P = 2147483647L
  // Dedup.arithPerms, flattened (kept in sync by MinhashSigsSpec)
  private val A = Array(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  private val B = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** Shared by the interpreted and generated paths; null = empty input. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(8)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val h = PolyHash.compute(shingles.getUTF8String(i))
        var k = 0
        while (k < 8) {
          val v = (h * A(k) + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** [[compute]] over pre-hashed shingles (array<long> of polyHashes) —
    * for callers that need the hash array anyway (e.g. hashed-set Jaccard
    * verify) and must not pay the string fold twice. */
  def computeFromHashes(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val mins = Array.fill(8)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        any = true
        val h = hashes.getLong(i)
        var k = 0
        while (k < 8) {
          val v = (h * A(k) + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Column-API entry point: `minhash_sigs($"shingles")`. */
  def minhash_sigs(shingles: Column): Column =
    GraftBridge.column(MinhashSigs(GraftBridge.expression(shingles)))
}
