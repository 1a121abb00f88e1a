package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Constant-folds [[To24Hour]] over string literals at optimization time.
  *
  * To24Hour is not marked foldable (it carries locale/formatter state), so
  * Catalyst's own ConstantFolding skips it; this rule evaluates literal
  * inputs once at plan time instead of once per row — the same contract
  * ConstantFolding gives built-ins. Demonstrates the `Rule[LogicalPlan]`
  * extension point (SURVEY §4: "optional demonstrative rule").
  */
object FoldTo24Hour extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case To24Hour(Literal(s: UTF8String, StringType)) =>
        Literal(To24Hour.convert(s), StringType)
      case To24Hour(Literal(null, StringType)) =>
        Literal(null, StringType)
    }
}

/** Session extensions wiring the graft Catalyst surface into any
  * SparkSession (SURVEY §7.3):
  *
  *   - `to_24h` and `sorted_intersect_size` as SQL-callable functions
  *     (`spark.sql("SELECT to_24h(raw_time) ...")`),
  *   - [[FoldTo24Hour]] as an optimizer rule.
  *
  * Activate via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.expr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("to_24h"),
      new ExpressionInfo(classOf[To24Hour].getName, "to_24h"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "to_24h expects exactly one argument")
        To24Hour(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sorted_intersect_size expects two arguments")
        SortedIntersectSize(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "normalize_text expects exactly one argument")
        NormalizeText(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "char_entropy expects exactly one argument")
        CharEntropy(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("ngram_cardinality"),
      new ExpressionInfo(classOf[NgramCardinality].getName, "ngram_cardinality"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngram_cardinality expects (string, n)")
        children(1) match {
          case Literal(n: Int, IntegerType) => NgramCardinality(children.head, n)
          case other => throw new IllegalArgumentException(
            s"ngram_cardinality: n must be an integer literal, got $other")
        }
      }))
    ext.injectOptimizerRule(_ => FoldTo24Hour)
  }
}
