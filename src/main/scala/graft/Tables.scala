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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    parallelize(spark, raw(spark, sfDir, name), s"$sfDir/$name.parquet", name)

  /** Primary key per table — the hash-repartition key [[parallelize]] uses
    * (hash on a unique key is balanced and needs no sort-before-repartition,
    * unlike round-robin). */
  private val pk: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** The un-fanned scan. For queries whose FIRST operator is already a
    * key shuffle (groupBy/window/distinct on a key) or a broadcast probe —
    * there the round-robin exchange from [[parallelize]] is pure overhead
    * at any scale, since the key shuffle immediately re-distributes. */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
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

  /** Fan a degenerate scan out to the cluster's parallelism.
    *
    * Parquet is only splittable at row-group boundaries, and the local
    * fixtures are single-row-group files — so every downstream operator
    * (explode, per-row hashing, partial aggregation) would otherwise run in
    * ONE task no matter how many cores exist. On a production multi-file /
    * multi-row-group table the scan already yields ≥ cores splits and this
    * is a no-op; it only fires for pathological few-split inputs, where one
    // small round-robin shuffle buys full-width parallelism for everything
    * above the scan. Dim tables below the broadcast threshold are left
    * alone (repartitioning them would just add an exchange in front of a
    * broadcast).
    */
  private def parallelize(spark: SparkSession, df: DataFrame, path: String,
                          name: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    // Plain File handles relative and absolute local paths alike (a
    // file:// URI parse would swallow the first segment of a relative
    // path as the URI authority and silently disable the fan-out).
    val bytes = try new java.io.File(path).length
      catch { case scala.util.control.NonFatal(_) => 0L }
    // pk.get, not pk(name): a table added to `all` without a pk entry must
    // degrade to round-robin fan-out, not throw at query-build time.
    val keys = pk.get(name).toSeq.flatten.map(org.apache.spark.sql.functions.col)
    if (bytes > 400 * 1024 && df.rdd.getNumPartitions * 2 < target)
      if (keys.nonEmpty) df.repartition(target, keys: _*)
      else df.repartition(target)
    else df
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

/** Collision-free temp views for SQL-surface queries. `spark.sql` analyzes
  * eagerly, so the views can be dropped as soon as the DataFrame is built —
  * nothing session-global survives the call, making SQL queries safe under
  * concurrent sessions/queries (fixed-name `createOrReplaceTempView` was a
  * race: two callers would silently read each other's registrations).
  */
object SqlViews {
  /** Register each (baseName → df) under `baseName_<uniqueTag>`, pass the
    * resolved names to `build`, then drop the views. */
  def withViews(s: SparkSession, dfs: (String, DataFrame)*)(
      build: Map[String, String] => DataFrame): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val names = dfs.map { case (base, _) => base -> s"${base}_$tag" }.toMap
    dfs.foreach { case (base, df) => df.createOrReplaceTempView(names(base)) }
    try build(names) finally names.values.foreach(s.catalog.dropTempView(_))
  }
}
