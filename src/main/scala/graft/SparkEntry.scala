package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in [[QueryModule]]s; this object folds them into the
  * frozen `queries`/`oracleSql` maps the driver's Verify/Bench loop reads.
  */
object SparkEntry {
  /** Every operator module. Key sets must be disjoint (enforced below). */
  val modules: Seq[QueryModule] = Seq(
    graft.operators.Relational,
    graft.operators.Headline,
    graft.sources.FileFormats,
    graft.functions.Scalars,
    graft.operators.Windows,
    graft.operators.GraphQueries,
    graft.operators.TextOps,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.Multimodal,
    graft.operators.TrainingPipeline,
    graft.operators.EventAnalytics,
    graft.operators.QualityOps,
    graft.operators.RefParity,
    graft.functions.Extensibility,
    graft.streaming.StreamingOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary: scan→filter→hash-agg→sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names across modules")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracles)
    val unknown = all.map(_._1).toSet -- queries.keySet
    require(unknown.isEmpty, s"oracles without queries: $unknown")
    all.toMap
  }
}
