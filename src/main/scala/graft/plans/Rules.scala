package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom Catalyst optimizer rules, injected through the public
  * `spark.experimental.extraOptimizations` extension point (the same slot
  * `SparkSessionExtensions.injectOptimizerRule` feeds when the session is
  * built with extensions).
  */
object GraftRules {

  /** Collapse `round(round(e, s1), s2)` with `s2 >= s1` to `round(e, s1)`.
    *
    * A value already rounded HALF_UP to scale s1 is representable at any
    * coarser-or-equal scale, so the outer round is an identity. Queries
    * composed from library fragments (each defensively rounding for oracle
    * stability) hit this pattern; the rewrite removes one interpreted
    * BigDecimal round per row.
    */
  object CollapseDoubleRound extends Rule[LogicalPlan] {
    def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      // Double only: on DecimalType, Round's RESULT TYPE carries the scale
      // literal, so collapsing would change the plan's output schema.
      case Round(inner @ Round(_, Literal(s1: Int, _), _), Literal(s2: Int, _), _)
          if s2 >= s1 &&
            inner.dataType == org.apache.spark.sql.types.DoubleType =>
        inner
    }
  }

  /** Install all graft rules on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(CollapseDoubleRound))
      spark.experimental.extraOptimizations = cur :+ CollapseDoubleRound
  }
}
