package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: an edit-distance predicate gets a length-difference
  * prefilter prepended. `|len(a) − len(b)| ≤ levenshtein(a, b)` (each
  * unmatched length unit costs ≥ 1 edit), so:
  *
  *  - `levenshtein(a, b) <= k`        ⟹ `abs(length(a) - length(b)) <= k`
  *  - `levenshtein(a, b) < k`         ⟹ `abs(length(a) - length(b)) < k`
  *  - `levenshtein(a, b, k) >= 0`     ⟹ `abs(length(a) - length(b)) <= k`
  *    (the THRESHOLD form returns −1 once the distance provably exceeds
  *    k, so `>= 0` selects distance ≤ k — q98's shape)
  *
  * The guard is branch-only string-length arithmetic; `And`
  * short-circuits in interpreted and codegen evaluation, so the O(k·n)
  * DP runs only for length-compatible pairs — on a hot block (many
  * same-prefix candidates of varied length) most pairs never reach it.
  * Null semantics are unchanged: null input nulls both the guard and
  * the original predicate, and a false guard implies the original
  * predicate is false (threshold form returns −1, plain form > k).
  *
  * Idempotent under the optimizer's fixpoint batch: the guard is only
  * added when no semantically-equal conjunct is already present.
  * Registered via [[graft.GraftExtensions]] or
  * `spark.experimental.extraOptimizations` (LevenshteinBoundSpec).
  */
object LevenshteinBoundRule extends Rule[LogicalPlan] with PredicateHelper {

  private def diff(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))

  // The guard DUPLICATES subexpressions of the conjunct — the bound k and
  // the levenshtein arguments (inside Length) — so every duplicated piece
  // must be safe to evaluate twice: a non-deterministic input anywhere in
  // the conjunct (`levenshtein(a, b) <= rand()*10`, or a rand()-mangled
  // string argument) would take different values in the guard and the
  // original predicate, silently dropping rows the predicate alone would
  // keep — and this rule is installed session-wide via GraftExtensions,
  // so any user filter/join of that shape would be miscompiled. Gate on
  // the WHOLE conjunct's determinism (covers k and both string args in
  // one check). Deterministic-but-expensive inputs pay one extra
  // evaluation; the win is skipping the O(k·n) DP, which dominates any
  // realistic bound or argument expression.
  private def guardOf(conjunct: Expression): Option[Expression] = conjunct match {
    case _ if !conjunct.deterministic => None
    case GreaterThanOrEqual(lev @ Levenshtein(_, _, Some(k)), Literal(0, IntegerType)) =>
      Some(LessThanOrEqual(diff(lev), k))
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), k) =>
      Some(LessThanOrEqual(diff(lev), k))
    case LessThan(lev @ Levenshtein(_, _, None), k) =>
      Some(LessThan(diff(lev), k))
    case _ => None
  }

  private def withGuards(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val missing = conjuncts.flatMap(guardOf)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (missing.isEmpty) None
    else Some((missing ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      withGuards(cond).map(c => f.copy(condition = c)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      withGuards(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
