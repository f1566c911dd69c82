package graft

import org.apache.spark.sql.SparkSession

/** Plan-health audit: prints `explain(formatted)` extracts for selected
  * queries so pushdown / broadcast / codegen posture can be reviewed.
  * Usage: runMain graft.PlanAudit [queryNameRegex] [sfDir] [outDir] [suffix]
  * With outDir/suffix, the FULL formatted plan of each matched query is
  * additionally written to outDir/<name>_<suffix>.txt (the r14
  * optimization-round before/after plan artifacts under plans/r14/).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val pat = args.headOption.getOrElse("q_pricing_summary|q_join_bcast|q_topk|q_filter_predicates").r
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2)
    val suffix = args.lift(3).getOrElse("plan")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pat.findFirstIn(n).isDefined }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          outDir.foreach { d =>
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$d/${name}_$suffix.txt"), plan)
          }
          // Compress: keep operator lines + pushdown/codegen markers.
          plan.linesIterator
            .filter(l => l.contains("(") || l.contains("PushedFilters") ||
              l.contains("ReadSchema") || l.contains("Codegen"))
            .take(60).foreach(println)
        } catch { case e: Throwable => println(s"AUDIT FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
