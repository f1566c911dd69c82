package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Production entry point for session-build-time injection:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the `cosine_sim` SQL function, the [[plans.GraftRules]]
  * optimizer rules and the [[plans.TopKPerKeyStrategy]] planner strategy.
  * (The same hooks are installed per-session at first use via
  * `experimental.extraOptimizations`/`extraStrategies` and the function
  * registry — this class is the cluster-deployment form, where extensions
  * must exist before any query runs.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(a, b) => functions.CosineSimilarity(a, b)
          case other => throw new IllegalArgumentException(
            s"cosine_sim expects 2 arguments, got ${other.size}")
        }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ngrams_gen"),
      new ExpressionInfo(classOf[functions.NGramsGen].getName, "ngrams_gen"),
      functions.NGramsGen.sqlBuilder))
    ext.injectOptimizerRule(_ => plans.GraftRules.CollapseDoubleRound)
    ext.injectOptimizerRule(_ => plans.GraftRules.BlockFuzzyJoin)
    ext.injectPlannerStrategy(_ => plans.TopKPerKeyStrategy)
  }
}
