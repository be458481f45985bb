package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prepend the pigeonhole length prune to Levenshtein
  * threshold predicates.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most one), so the O(1) length
  * check can short-circuit the O(|a|·|b|) dynamic program for the vast
  * majority of non-matching pairs. Fuzzy-join conditions are exactly
  * where this matters: the conjunct is evaluated first in the rewritten
  * `And` chain, so a length mismatch never runs the DP at all.
  * [[graft.operators.EntityResolution]] adds this prune by hand; the rule
  * gives every ad-hoc `spark.sql` fuzzy query the same protection.
  *
  * Soundness: only TOP-LEVEL conjuncts of Filter/Join conditions are
  * augmented (a Levenshtein under an OR implies nothing about the whole
  * predicate), `<= k` and `< k` both imply `|Δlen| <= k`, and the added
  * conjunct is implied by the original — the predicate's truth value is
  * unchanged. Idempotence: a prune is only added when no semantically
  * equal conjunct already exists, so repeated optimizer passes (and the
  * rule's own output) reach a fixpoint.
  */
object LevenshteinLengthPrune extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val augmented = augment(cond)
      if (augmented fastEquals cond) f else f.copy(condition = augmented)
    case j @ Join(_, _, _, Some(cond), _) =>
      val augmented = augment(cond)
      if (augmented fastEquals cond) j else j.copy(condition = Some(augmented))
  }

  private def augment(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    // post-analysis there is no implicit casting: only augment when the
    // bound is already an IntegerType literal (levenshtein's own type),
    // so the built comparison is type-correct as constructed
    def ok(a: Expression, b: Expression, k: Literal): Boolean =
      a.deterministic && b.deterministic &&
        k.dataType == org.apache.spark.sql.types.IntegerType
    val prunes = conjuncts.flatMap {
      case LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
          if ok(a, b, k) => Some(prune(a, b, k))
      case LessThan(Levenshtein(a, b, None), k: Literal)
          if ok(a, b, k) => Some(prune(a, b, k))
      case GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None))
          if ok(a, b, k) => Some(prune(a, b, k))
      case _ => None
    }.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
    if (prunes.isEmpty) cond
    // prunes FIRST: And evaluates left-to-right, so the length check
    // short-circuits the DP
    else (prunes ++ conjuncts).reduce(And)
  }

  private def prune(a: Expression, b: Expression, k: Literal): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)
}
