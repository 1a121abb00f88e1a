package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy (nats) as a compiled one-pass expression.
  *
  * Motivation: the HOF spelling (`aggregate(array_sort(array_distinct(
  * split(s, ""))), 0.0, (acc, c) => acc + p(c)·ln p(c))` with
  * `p(c) = size(filter(chars, _ === c)) / n`) re-scans the WHOLE per-char
  * array once per DISTINCT character through two interpreted lambdas —
  * O(distinct·len) with ~36 k lambda dispatches per ~900-char document.
  * It made q_repetition the single most expensive bench row (9.4 s at
  * sf0.1) once forced timing exposed map-only plans. This expression
  * counts code points in one pass and folds the p·ln p terms in ASCENDING
  * CODE POINT order — exactly the HOF's order (single-code-point strings
  * sort by UTF-8 bytes, and UTF-8 byte order IS code point order), with
  * the same per-term arithmetic (`cnt/n` then `p·StrictMath.log(p)`, `acc +`
  * left fold, final negate) — so the result is bit-identical and every
  * DuckDB oracle is unchanged. TextExprsSpec pins equality against the
  * HOF spelling on the real corpus plus edge shapes.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    // count code points: dense array fast path for ASCII, TreeMap overflow
    // for the rest — iteration below must be in ascending code point order
    val ascii = new Array[Int](128)
    var high: java.util.TreeMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (high == null) high = new java.util.TreeMap[Integer, Integer]()
        val prev = high.get(cp)
        high.put(cp, if (prev == null) 1 else prev + 1)
      }
      n += 1
      i += Character.charCount(cp)
    }
    val nd = n.toDouble
    // StrictMath.log, not Math.log: Spark's ln expression evaluates via
    // StrictMath and the two can differ in the last ulp — the HOF twin
    // (and therefore the committed oracle hashes) are StrictMath-exact
    var acc = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) {
        val p = ascii(c) / nd
        acc += p * java.lang.StrictMath.log(p)
      }
      c += 1
    }
    if (high != null) {
      val it = high.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getValue.intValue() / nd
        acc += p * java.lang.StrictMath.log(p)
      }
    }
    -acc
  }

  /** Column-API entry point: `char_entropy($"text")`. */
  def char_entropy(s: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(s)))
}

/** Distinct character-n-gram cardinality as a compiled one-pass expression
  * (the shingle-space size; q_ngram_cardinality). The HOF spelling
  * (`size(array_distinct(transform(sequence(...), i => substring(text, i,
  * n))))`) materializes a per-position string array plus its dedup copy per
  * row; this expression slides one window over the code points and inserts
  * each gram into a hash set — n ≤ 3 grams pack into one long (3 × 21-bit
  * code points), so the common case allocates no strings at all. Texts
  * shorter than n code points count 0, like the HOF's `when` guard. */
case class NgramCardinality(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ngram_cardinality"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    NgramCardinality.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NgramCardinality.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramCardinality =
    copy(child = newChild)
}

object NgramCardinality {
  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, n: Int): Int = {
    val str = s.toString
    // code point positions (surrogate-pair safe)
    val cps = str.codePoints().toArray
    if (cps.length < n) return 0
    if (n <= 3) {
      // pack ≤ 3 code points (21 bits each) into one long — no string allocs
      val seen = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i + n <= cps.length) {
        var key = 0L
        var j = 0
        while (j < n) { key = (key << 21) | cps(i + j).toLong; j += 1 }
        seen.add(key)
        i += 1
      }
      seen.size()
    } else {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= cps.length) {
        seen.add(new String(cps, i, n))
        i += 1
      }
      seen.size()
    }
  }

  /** Column-API entry point: `ngram_cardinality($"text", 3)`. */
  def ngram_cardinality(s: Column, n: Int): Column =
    GraftBridge.column(NgramCardinality(GraftBridge.expression(s), n))
}
