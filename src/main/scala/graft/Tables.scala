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

  /** events.ts has shipped in two parquet encodings across fixture
    * generations: INT64 TIMESTAMP(NANOS) (Spark rejects it natively —
    * [PARQUET_TYPE_ILLEGAL] — so it is read as a raw nanosecond long under
    * `nanosAsLong` and floor-divided to microseconds; integer div, a double
    * division would lose precision at 1.7e18) and plain TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ, cast to an instant — value-preserving because
    * every session here pins UTC). Normalize either to native
    * TimestampType so downstream queries and oracles see one encoding.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
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
      // nanosAsLong is inert for non-NANOS encodings; see normalizeEventTs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
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
