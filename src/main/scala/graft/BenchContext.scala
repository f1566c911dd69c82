package graft

/** Cross-thread handoff of the bench's per-sample job group (r10 VERDICT
  * #4): `setJobGroup` is a THREAD-LOCAL property, so jobs launched from
  * Structured Streaming microbatch threads never inherited the group the
  * bench set on its own thread — `q_stream_*` barrier counts were a
  * floor (driver-side jobs only), blind on exactly the queries that pay
  * the most scheduling overhead. The bench publishes the active group
  * here before running a query; every `foreachBatch` body re-sets it on
  * ITS thread via [[tagStreamThread]], so microbatch jobs land in the
  * same group and the published `barrier_jobs`/`barrier_stages` become
  * real per-query totals. Outside the bench (Verify, tests) the field
  * stays None and tagging is a no-op. */
object BenchContext {
  @volatile var jobGroup: Option[(String, String)] = None

  /** Re-set the bench's active job group on the CALLING thread — call
    * first thing inside a foreachBatch body. No-op outside the bench. */
  def tagStreamThread(s: org.apache.spark.sql.SparkSession): Unit =
    jobGroup.foreach { case (group, desc) =>
      s.sparkContext.setJobGroup(group, s"$desc (microbatch)",
        interruptOnCancel = false)
    }
}
