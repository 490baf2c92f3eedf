package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, Literal, Or, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (SURVEY.md §4 custom-hook tier, injected via
  * [[graft.functions.GraftExtensions]]): an `RLIKE` whose literal pattern is
  * a pure alternation of metacharacter-free literals — the reference's
  * validity filter `widget|bolt` shape (F1) — is exactly the OR of substring
  * containments, because Java-regex `find()` over literal alternatives
  * succeeds iff some alternative is a substring. `Contains` is a codegen'd
  * UTF8String scan, roughly an order of magnitude cheaper per row than the
  * regex engine, and null semantics carry over unchanged (null input →
  * null → filtered, both forms).
  *
  * Deliberately conservative: only `[A-Za-z0-9 _]` alternatives qualify;
  * anything resembling regex syntax keeps the regex engine.
  */
object RewriteLiteralAlternationRLike extends Rule[LogicalPlan] {

  private def literalParts(pattern: String): Option[Seq[String]] = {
    val parts = pattern.split("\\|", -1).toSeq
    if (parts.nonEmpty && parts.forall(p => p.nonEmpty && p.matches("^[A-Za-z0-9 _]+$")))
      Some(parts)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case r @ RLike(left, Literal(p: UTF8String, StringType)) if p != null =>
      literalParts(p.toString) match {
        case Some(parts) =>
          parts.map(s => Contains(left, Literal(UTF8String.fromString(s), StringType)): Expression)
            .reduceLeft(Or(_, _))
        case None => r
      }
  }
}
