package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayMax, ArrayMin, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.geo.PointInPolygon

/** Optimizer rule (SURVEY.md §4 "bbox prefilter"): a spatial join whose
  * condition is a bare `st_contains(xs, ys, x, y)` gets a bounding-box
  * conjunct prepended:
  *
  * {{{ x >= min(xs) AND x <= max(xs) AND y >= min(ys) AND y <= max(ys) }}}
  *
  * The bbox test is branch-only (no division) and rejects most
  * non-matching (point, polygon) pairs before the ray-cast loop runs —
  * the cheap-conjunct-first pattern every spatial engine uses. `And`
  * short-circuits in both interpreted and codegen evaluation, so the
  * ray cast is skipped whenever the bbox misses.
  *
  * Idempotent by construction: the rewrite only fires when the join
  * condition IS the bare PointInPolygon; the rewritten condition is an
  * `And`, which no longer matches. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object SpatialBboxRule extends Rule[LogicalPlan] {

  private def bbox(pip: PointInPolygon): Expression = {
    val (xs, ys, x, y) = (pip.first, pip.second, pip.third, pip.fourth)
    And(
      And(GreaterThanOrEqual(x, ArrayMin(xs)), LessThanOrEqual(x, ArrayMax(xs))),
      And(GreaterThanOrEqual(y, ArrayMin(ys)), LessThanOrEqual(y, ArrayMax(ys))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, _, Some(pip: PointInPolygon), _) =>
      j.copy(condition = Some(And(bbox(pip), pip)))
  }
}
