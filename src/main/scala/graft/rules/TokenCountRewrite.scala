package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `size(split(text, " ", -1))` → `token_count(text)`.
  *
  * The split+size composition materializes the whole token array per row —
  * one object per token plus the array — only to take its length; the
  * rewrite is a single allocation-free byte pass
  * ([[graft.expr.Kernels.tokenCount]]). Exactly equal by construction:
  * split with limit −1 keeps every empty string, so the array size is
  * (separator count) + 1, and both sides are null ⇔ input null (the rule
  * only matches the modern `legacySizeOfNull = false` Size).
  *
  * Fires only on the literal single-space separator — the one this
  * codebase's token-count idiom uses (quality/Gopher/cap/pareto gates). A
  * general separator would need regex analysis; a single space has no
  * metacharacters and cannot appear inside a UTF-8 multi-byte sequence.
  *
  * Installed by [[graft.GraftSessionExtensions]] (injectOptimizerRule) and
  * `Graft.register` (experimental.extraOptimizations). A logical-plan
  * rewrite, so it applies underneath ANY API shape — SQL text, Column DSL,
  * or views — the §2-B extension-point row Catalyst Expressions alone
  * cannot cover.
  */
object TokenCountRewrite extends Rule[LogicalPlan] {
  private val space = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(sep: UTF8String, StringType),
            Literal(-1, IntegerType)), false) if sep == space =>
        graft.expr.TokenCount(str)
    }
}
