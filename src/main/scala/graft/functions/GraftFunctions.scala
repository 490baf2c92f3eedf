package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom expressions, so `spark.sql`
  * users get them too: either per-session via [[GraftFunctions.register]] or
  * at build time via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `SparkSessionExtensions` hook (SURVEY.md §4 custom-hook tier): SQL
  * function surface + the literal-alternation RLIKE rewrite rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.RewriteLiteralAlternationRLike)
  }
}
