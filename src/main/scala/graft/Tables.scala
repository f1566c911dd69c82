package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated parquet star schema.
  *
  * All operators take `(SparkSession, sfDir)` and read via this object so
  * the scan layer is one place: parquet only, schema from footer, filters
  * and projections pushed down by Catalyst (verify via `PushedFilters` in
  * `.explain("formatted")`).
  *
  * Scale posture: at 100 TB each `name` is a partitioned parquet dataset
  * (directory); `spark.read.parquet` handles both the single-file local
  * fixtures and a production multi-file layout identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** One category of operators: Spark-side queries plus, for every query
  * that is ANSI-SQL-expressible, a DuckDB oracle over the same tables.
  * `SparkEntry` aggregates all modules.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL keyed by the same names; omit a key for rows-only checks. */
  def oracles: Map[String, String]
}
