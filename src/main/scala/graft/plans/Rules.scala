package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

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

  /** Rewrite an edit-distance theta join — `a JOIN b ON
    * levenshtein(x, y) <= k` (which Catalyst can only plan as a nested
    * loop over the cross product) — into a banded EQUI join:
    * `|len(x) − len(y)| <= lev(x, y)`, so the left side tags each row with
    * `len(x)` and the right side fans out to the 2k+1 bands
    * `len(y)−k .. len(y)+k`; a qualifying pair meets in exactly the one
    * band equal to `len(x)`, making the band a loss-free blocking key.
    * The original predicate stays as the join's residual condition, so
    * levenshtein now runs on band collisions instead of all pairs and the
    * join plans as a hash/sort-merge join on the band.
    *
    * Fires only on inner/cross joins whose condition has a
    * `levenshtein <= k` conjunct with sides cleanly split, no existing
    * equi-join key (those already avoid the nested loop), and small k
    * (each right row is replicated 2k+1 times).
    */
  object BlockFuzzyJoin extends Rule[LogicalPlan] {
    private val BandName = "__graft_lev_band"
    private val MaxK = 8

    private def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
      case other => Seq(other)
    }

    /** (leftArg, rightArg, k) when `c` bounds a levenshtein between the
      * two sides by a small integer literal. */
    private def levBound(c: Expression, l: LogicalPlan, r: LogicalPlan)
        : Option[(Expression, Expression, Int)] = {
      def sides(x: Expression, y: Expression, k: Int) =
        if (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet))
          Some((x, y, k))
        else if (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))
          Some((y, x, k))
        else None
      c match {
        case LessThanOrEqual(Levenshtein(x, y, None), Literal(k: Int, IntegerType)) =>
          sides(x, y, k)
        case LessThan(Levenshtein(x, y, None), Literal(k: Int, IntegerType)) =>
          sides(x, y, k - 1)
        case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(x, y, None)) =>
          sides(x, y, k)
        case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(x, y, None)) =>
          sides(x, y, k - 1)
        case _ => None
      }
    }

    def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if !j.output.exists(_.name.startsWith(BandName)) => // idempotence
        val conjuncts = splitConjuncts(cond)
        val hasEquiKey = conjuncts.exists {
          // Both sides must actually REFERENCE a side: a constant-side
          // EqualTo (e.g. `a.x = 'foo'`) has an empty reference set, which
          // is trivially a subset of both outputSets — counting it as an
          // equi key would suppress the rewrite and leave the join a
          // nested loop.
          case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        conjuncts.iterator.flatMap(levBound(_, left, right)).buffered.headOption match {
          case Some((la, ra, k)) if !hasEquiKey && k >= 0 && k <= MaxK =>
            val bandL = Alias(Length(la), BandName + "_l")()
            val leftB = Project(left.output :+ bandL, left)
            val bandR = AttributeReference(BandName + "_r", IntegerType)()
            val bands = CreateArray((-k to k).map(i =>
              Add(Length(ra), Literal(i))))
            val rightB = Generate(Explode(bands), Nil, outer = false, None,
              Seq(bandR), right)
            val newCond = And(EqualTo(bandL.toAttribute, bandR), cond)
            // keep the user's join hint (e.g. an explicit broadcast)
            Project(j.output,
              Join(leftB, rightB, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }

  /** Install all graft rules on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val add = Seq(CollapseDoubleRound, BlockFuzzyJoin).filterNot(cur.contains)
    spark.experimental.extraOptimizations = cur ++ add
  }
}
