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

  /** events schema as read with nanosAsLong (ts: raw nanosecond long) —
    * needed by the streaming file source, which requires an explicit schema. */
  val rawEventsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.ts is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
      // rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and floor-divide
      // to microseconds (integer div — a double division would lose precision
      // at 1.7e18) to rebuild a native TimestampType column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
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
