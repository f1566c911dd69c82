package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Diagnostic stage-level timer for the PPJoin prefix pipeline (r14
  * optimization round): replicates `Dedup.jaccardPairs`' prefix path
  * stage by stage with eager materialization between stages, so each
  * published number is one stage's wall time at the given scale.
  * NOT part of the query surface — attribution tooling only.
  * Usage: runMain graft.StageProbe [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      println(f"[stageprobe] $tag%-28s +${(System.nanoTime() - t0) / 1e9}%.2f s total")

    val threshold = 0.85
    val docs = Tables(spark, sfDir, "documents")
    // warm the scan
    docs.write.format("noop").mode("overwrite").save()
    lap("warm-scan")

    val tk = split(col("text"), " ")
    val bigrams = array_distinct(zip_with(
      slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
      (a, b) => concat(a, lit(" "), b)))
    val sh = docs.select(col("doc_id"), explode(bigrams).as("s"))
      .localCheckpoint(true)
    lap("shingle+checkpoint")

    val w = Window.partitionBy("doc_id").orderBy(col("dfreq"), col("s"))
    val pfx = sh
      .withColumn("dfreq", count(lit(1)).over(Window.partitionBy("s")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-6)) + 1)
      .select("doc_id", "s", "r", "n")
      .localCheckpoint(true)
    lap("prefix-rank")

    // r14 symmetric spelling (index prefix × index prefix, da < db,
    // positional filter at alpha = ceil(t * max(na, nb))) — kept as the
    // BEFORE leg of the r15 PPJoin+ comparison
    val candOldPlan = pfx.select(col("doc_id").as("da"), col("s"), col("r").as("ra"), col("n").as("na"))
      .join(pfx.select(col("doc_id").as("db"), col("s"), col("r").as("rb"), col("n").as("nb")), Seq("s"))
      .filter(col("da") < col("db") &&
        col("nb") >= ceil(lit(threshold) * col("na") - lit(1e-6)) &&
        col("na") >= ceil(lit(threshold) * col("nb") - lit(1e-6)) &&
        least(col("na") - col("ra"), col("nb") - col("rb")) + 1 >=
          ceil(lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-6)))
      .select("da", "db", "na", "nb").distinct()
    val candOld = candOldPlan.localCheckpoint(true)
    println(s"[stageprobe] cand rows (r14 symmetric) = ${candOld.count()}")
    lap("prefix-collision-join-r14")

    // r15 PPJoin+ spelling: probe prefix (n - ceil(2t/(1+t) n) + 1) on the
    // smaller side under (n, doc_id) orientation, positional filter at the
    // sum bound alpha = ceil(t/(1+t) (na+nb)) — must be what
    // Dedup.jaccardPairs ships
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("na") + col("nb")) - lit(1e-6))
    val probe = pfx
      .filter(col("r") <= col("n") -
        ceil(lit(2 * threshold / (1 + threshold)) * col("n") - lit(1e-6)) + 1)
      .select(col("doc_id").as("xa"), col("s"), col("r").as("ra"), col("n").as("na"))
    val candPlan = probe
      .join(pfx.select(col("doc_id").as("xb"), col("s"), col("r").as("rb"), col("n").as("nb")), Seq("s"))
      .filter((col("na") < col("nb") ||
          (col("na") === col("nb") && col("xa") < col("xb"))) &&
        col("na") >= ceil(lit(threshold) * col("nb") - lit(1e-6)) &&
        least(col("na") - col("ra"), col("nb") - col("rb")) + 1 >= alpha)
      .select(least(col("xa"), col("xb")).as("da"),
        greatest(col("xa"), col("xb")).as("db"),
        when(col("xa") < col("xb"), col("na")).otherwise(col("nb")).as("na"),
        when(col("xa") < col("xb"), col("nb")).otherwise(col("na")).as("nb"))
      .distinct()
    val cand = candPlan.localCheckpoint(true)
    println(s"[stageprobe] cand rows (r15 ppjoin+)   = ${cand.count()}")
    lap("prefix-collision-join-r15")
    // The collision join executes during query CONSTRUCTION (checkpoint
    // barrier), so it never appears in the final query's explain — dump
    // both spellings' plans here as the committed plan evidence.
    val planDir = new java.io.File("plans/r15")
    if (planDir.isDirectory) {
      def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r15/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      dump(candOldPlan, "ppjoin_collision_join_r14spelling")
      dump(candPlan, "ppjoin_collision_join_r15spelling")
    }

    val sid = sh.select("s").distinct()
      .withColumn("sid", monotonically_increasing_id())
    val lists = sh.join(sid, Seq("s"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("sid"))).as("ls"))
      .localCheckpoint(true)
    lap("sid-map+lists")

    val inter = cand
      .join(lists.select(col("doc_id").as("da"), col("ls").as("la")), Seq("da"))
      .join(lists.select(col("doc_id").as("db"), col("ls").as("lb")), Seq("db"))
      .select(col("da"), col("db"), col("na"), col("nb"),
        graft.functions.SortedIntersectCount(col("la"), col("lb")).as("c"))
    val jac = col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double")
    inter.filter(jac >= threshold)
      .select(col("da"), col("db"), round(jac, 4).as("jaccard"))
      .orderBy("da", "db")
      .write.format("noop").mode("overwrite").save()
    lap("intersect+readout")
    spark.stop()
  }
}
