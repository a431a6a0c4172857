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
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[L2NormSq].getName, "graft_norm2"),
      (args: Seq[Expression]) => L2NormSq(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_dotl"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dotl"),
      (args: Seq[Expression]) => DotProductLong(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      (args: Seq[Expression]) => ZValue(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => new BloomFilterAggregate(args.head)))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
      (args: Seq[Expression]) => new BloomFilterMightContain(args(0), args(1))))
    ext.injectOptimizerRule(_ => SelfDotToNorm)
    ext.injectPlannerStrategy(s => graft.plans.RangeJoinStrategy(s))
  }
}

object GraftExtensions {
  /** Imperative registration for sessions built without the extension
    * config (e.g. the driver's own smoke session). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", (args: Seq[Expression]) => DotProduct(args(0), args(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_norm2", (args: Seq[Expression]) => L2NormSq(args.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dotl", (args: Seq[Expression]) => DotProductLong(args(0), args(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue",
      (args: Seq[Expression]) => ZValue(args(0), args(1),
        args(2).eval().asInstanceOf[Number].intValue), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      (args: Seq[Expression]) => new BloomFilterAggregate(args.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      (args: Seq[Expression]) => new BloomFilterMightContain(args(0), args(1)), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(SelfDotToNorm))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SelfDotToNorm
  }
}
