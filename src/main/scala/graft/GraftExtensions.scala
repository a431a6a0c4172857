package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProduct, DotProductLong, L2NormSq, ZValue}

/** Optimizer rule: a self-dot-product is a squared norm — rewrite
  * `graft_dot(x, x)` to the cheaper single-pass `graft_norm2(x)`.
  * A small but genuine Catalyst `Rule[LogicalPlan]` demonstrating the
  * engine's optimizer extension point (SURVEY §4.2). */
object SelfDotToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case DotProduct(a, b) if a.semanticEquals(b) => L2NormSq(a)
  }
}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b) ...")`
  * works next to the Column API. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or call
  * [[GraftExtensions.register]] on a live session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name), builder))
    }
    ext.injectOptimizerRule(_ => SelfDotToNorm)
    ext.injectPlannerStrategy(s => graft.plans.RangeJoinStrategy(s))
  }
}

object GraftExtensions {

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  /** ONE builder table shared by the extension path and the imperative
    * path — the two registration routes cannot drift on the function
    * set (they did once: register() silently lacked the planner
    * strategy). Arity and literal-ness are checked so a misuse is a
    * clean analysis-time error, not an IndexOutOfBounds/NPE. */
  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName, args => {
      arity("graft_dot", args, 2); DotProduct(args(0), args(1))
    }),
    ("graft_norm2", classOf[L2NormSq].getName, args => {
      arity("graft_norm2", args, 1); L2NormSq(args.head)
    }),
    ("graft_dotl", classOf[DotProductLong].getName, args => {
      arity("graft_dotl", args, 2); DotProductLong(args(0), args(1))
    }),
    ("graft_zvalue", classOf[ZValue].getName, args => {
      arity("graft_zvalue", args, 3)
      if (!args(2).foldable || args(2).eval() == null)
        throw new IllegalArgumentException(
          "graft_zvalue's bits argument must be a non-null integer literal")
      ZValue(args(0), args(1), args(2).eval().asInstanceOf[Number].intValue)
    }),
    ("graft_bloom_agg", classOf[BloomFilterAggregate].getName, args => {
      arity("graft_bloom_agg", args, 1); new BloomFilterAggregate(args.head)
    }),
    ("graft_bloom_contains", classOf[BloomFilterMightContain].getName, args => {
      arity("graft_bloom_contains", args, 2)
      new BloomFilterMightContain(args(0), args(1))
    }))

  /** Imperative registration for sessions built without the extension
    * config (e.g. the driver's own smoke session). Idempotent, and
    * registers the SAME surface as the extension path: functions, the
    * optimizer rule, AND the range-join planner strategy. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(SelfDotToNorm))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotToNorm
    val strat = graft.plans.RangeJoinStrategy(spark)
    if (!spark.experimental.extraStrategies.contains(strat))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strat
  }
}
