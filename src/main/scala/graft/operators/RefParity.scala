package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Assignment-1 parity shims: ping (A12, `Assignment1/server.c:54-82`) and
  * file-exists (A13, `Assignment1/server.c:88-172`). Word count (A14) is
  * generalized by [[TextOps]] `q_text_wordcount`.
  *
  * These are deliberately tiny — their reference counterparts are IPC
  * round-trips, and the honest Spark mapping is a health-check action and a
  * storage-catalog probe.
  */
object RefParity extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A12 ping: "Hi" → "Hello", as a 1-row health check through a real job.
    "q_ping" -> ((s, dir) => {
      import s.implicits._
      Seq(("Hi", "Hello", s.range(1).count())).toDF("request", "reply", "ok")
    }),

    // A13 file-exists: which star-schema tables exist under the sf dir
    // (exec find → Hadoop FS listing). Oracle = the fixed fixture contract
    // (TESTDATA.md: every sf dir ships all ten tables), so a probe failure
    // surfaces as a hash mismatch.
    "q_file_exists" -> ((s, dir) => {
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      Tables.all.map(t => (t,
          fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$t.parquet"))))
        .toDF("table_name", "found")
        .orderBy("table_name")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_ping" -> "SELECT 'Hi' AS request, 'Hello' AS reply, CAST(1 AS BIGINT) AS ok",
    "q_file_exists" -> {
      val rows = graft.Tables.all.sorted.map(t => s"('$t', TRUE)").mkString(", ")
      s"SELECT table_name, found FROM (VALUES $rows) t(table_name, found) ORDER BY table_name"
    }
  )
}
