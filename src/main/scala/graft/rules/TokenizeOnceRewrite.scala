package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Alias, Explode, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expr.TokenizeJaNeologd

/** Optimizer rule: evaluate `tokenize_ja_neologd` ONCE when the same call
  * feeds both an `explode` generator and the surrounding projection
  * (SURVEY §2-B "possible later perf Rule: push tokenize below explode
  * duplication").
  *
  * The hazard shape is a single select like
  * `select(explode(tokenize(text)) as tok, size(tokenize(text)) as n)`:
  * Catalyst plans it as Project(.., size(tokenize(text)), Generate(
  * explode(tokenize(text)), .., scan)) — the generator copy runs once per
  * INPUT row inside GenerateExec, but the projection copy re-runs the full
  * Viterbi lattice once per OUTPUT row, i.e. token-count times per
  * document. (The two-step alias form `withColumn("toks", ...)` never
  * duplicates — a Project pinned under Generate carries the array — so
  * this rule rewrites the one-select shape INTO that form.)
  *
  * Rewrite: Project(projList, Generate(Explode(tok), ...)) where projList
  * contains a semantically-equal `tok` becomes
  * Project(projList[tok := a], Generate(Explode(a),
  * Project(child.output :+ Alias(tok) as a, child))) — the tokenize runs
  * once per input row in the injected Project; the generator explodes the
  * materialized array; downstream references read the attribute.
  * `unrequiredChildIndex` is reset to Nil (it indexes the OLD child's
  * output; column pruning re-derives it against the new Project). The
  * rewritten generator is `Explode(attr)`, so the rule cannot re-fire.
  */
object TokenizeOnceRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        g @ Generate(e @ Explode(tok: TokenizeJaNeologd), _, outer, qualifier, genOutput, child))
        if projList.exists(ne => ne.exists {
          case t: TokenizeJaNeologd => t.semanticEquals(tok)
          case _ => false
        }) =>
      val alias = Alias(tok, "_graft_toks")()
      val below = Project(child.output :+ alias, child)
      val newGenerate = Generate(Explode(alias.toAttribute), Nil, outer, qualifier, genOutput, below)
      val newProjList = projList.map(_.transform {
        case t: TokenizeJaNeologd if t.semanticEquals(tok) => alias.toAttribute
      }.asInstanceOf[NamedExpression])
      Project(newProjList, newGenerate)
  }
}
