package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Extensibility surface (B14): scalar UDF, typed UDAF (`Aggregator`), and
  * the native codegen [[CosineSimilarity]] expression — demonstrated via
  * oracle-checked queries.
  *
  * Preference order at scale (SURVEY.md §2 B14): built-in functions >
  * native codegen `Expression` > JVM UDF — a UDF breaks whole-stage
  * codegen at its column boundary, an `Expression` with `doGenCode` does
  * not. The UDAF below ships partial aggregates (map-side combine), so it
  * shuffles one (sum, weight) pair per group per partition, not raw rows.
  */
object Extensibility extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // Raw scan for the queries that aggregate/shuffle on their own keys right
  // above the scan — there the small-file fan-out shuffle is pure overhead
  // (the UDAF/UDF already parallelize via map-side partial aggregation).
  private def tr(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.raw(s, dir, name)

  /** Typed weighted-average aggregator: avg(price weighted by qty). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Double)): Double = if (r._2 == 0.0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed UDAF: per-flag quantity-weighted mean price.
    "q_udaf_wavg" -> ((s, dir) => {
      val wavg = udaf(WeightedAvg)
      tr(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Scalar UDF (JVM): price-band classifier. Oracle = same CASE logic.
    "q_udf_band" -> ((s, dir) => {
      val band = udf((p: Double) =>
        if (p < 50000) "low" else if (p < 200000) "mid" else "high")
      tr(s, dir, "orders")
        .groupBy(band(col("o_totalprice")).as("band"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("band")
    }),

    // Custom whole-operator path (LogicalPlan + Strategy + two-phase
    // physical exec): top-3 orders per customer with map-side rank pruning.
    // See graft.plans.TopKPerKey.
    "q_topk_perkey" -> ((s, dir) => {
      val o = tr(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      graft.plans.TopK.perKey(o, 3,
          Seq("o_custkey"),
          Seq("o_totalprice" -> true, "o_orderkey" -> false))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
    }),

    // Custom UDTF (Catalyst Generator): word trigrams per document via the
    // native Generate operator; recurring trigrams per language.
    // Heavy-hitter plan shape: counting groupBy's shuffle key is the
    // 64-bit xxhash of (lang, ngram) — 16-byte rows at full n-gram
    // cardinality, never raw trigram strings (which approach corpus size).
    // Strings re-attach in a second Generate pass joined against the
    // surviving (n >= 3) hash set, so the raw-string distinct touches only
    // heavy hitters. The survivor join is deliberately UNHINTED: the
    // survivor set's cardinality grows with the corpus (at a fixed
    // threshold), so a forced broadcast would eventually exceed any
    // broadcast budget — AQE broadcasts it while it is genuinely small and
    // flips to a shuffle join on the 8-byte hash key once it isn't. A hash
    // collision would merge two n-grams and fail the oracle compare —
    // 2^-64-scale risk, the standard heavy-hitter trade.
    "q_udtf_ngrams" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      def grams = t(s, dir, "documents")
        .select(col("lang"), NGramsGen.ngrams(toks, 3).as("ngram"))
      val survivors = grams
        .select(xxhash64(col("lang"), col("ngram")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
      grams.join(survivors,
          xxhash64(col("lang"), col("ngram")) === col("h"))
        .select("lang", "ngram", "n").distinct()
        .orderBy("lang", "ngram")
    }),

    // Custom TypedImperativeAggregate: count-min sketch of event_type
    // frequencies (4 rows x 256 buckets). Partial sketches build map-side
    // and merge by elementwise add — one 8 KB row per partition reaches
    // the final combine regardless of corpus size; the estimate for each
    // probe key is the MIN of its 4 counters, read out of the sketch with
    // element_at. Bucket hashing is the portable md5 family, so the DuckDB
    // oracle recomputes every counter cell and the estimates match
    // bit-for-bit (see CountMinSketch scaladoc).
    "q_sketch_cms" -> ((s, dir) => {
      val (d, wdt) = (4, 256)
      val ev = tr(s, dir, "events")
      val sk = ev
        .select(CountMinSketch.buckets(col("event_type"), d, wdt).as("bk"))
        .agg(CountMinSketch.sketch(col("bk"), d, wdt).as("sk"))
      val probes = ev.select("event_type").distinct()
        .select(col("event_type"),
          CountMinSketch.buckets(col("event_type"), d, wdt).as("pk"))
      val est = (0 until d).map(r =>
          element_at(col("sk"),
            (lit(r * wdt) + element_at(col("pk"), r + 1)).cast("int") + 1))
        .reduce(least(_, _))
      probes.join(broadcast(sk))
        .select(col("event_type"), est.as("est"))
        .orderBy("event_type")
    }),

    // Native codegen Expression: same result contract as q_sim_topk but the
    // cosine runs in one fused loop (see CosineSimilarity scaladoc).
    "q_sim_expr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
      broadcast(q).join(e, col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          round(CosineSimilarity.cosineSim(col("qe"), col("embedding")), 4).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vec_id"), col("cosine"), col("rn"))
        .orderBy("qid", "rn")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_udaf_wavg" ->
      """SELECT l_returnflag,
         ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_udf_band" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS band,
         COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
         FROM orders GROUP BY 1 ORDER BY band""",
    "q_topk_perkey" ->
      """SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",
    "q_udtf_ngrams" ->
      """WITH tk AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
         pos AS (SELECT lang, t, unnest(range(1, len(t) - 1)) AS i FROM tk),
         ng AS (SELECT lang,
             t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' ||
             t[CAST(i AS INT) + 2] AS ngram
           FROM pos)
         SELECT lang, ngram, COUNT(*) AS n FROM ng
         GROUP BY lang, ngram HAVING COUNT(*) >= 3
         ORDER BY lang, ngram""",
    // identical result contract to q_sim_topk → same oracle, by reference
    "q_sim_expr" -> graft.operators.Similarity.cosineSql("vec_id < 10", "", 5),
    // The oracle rebuilds the touched counter cells from first principles:
    // cell(r, b) = COUNT of items hashing to bucket b in row r; estimate =
    // MIN over rows of the probe's cell. Same portable bucket hash.
    "q_sketch_cms" ->
      s"""WITH r AS (SELECT unnest(range(0, 4)) AS r),
         cells AS (SELECT r.r, ${CountMinSketch.bucketSql("e.event_type", "r.r", 256)} AS b,
             COUNT(*) AS cnt
           FROM events e CROSS JOIN r GROUP BY 1, 2),
         p AS (SELECT DISTINCT event_type FROM events),
         pb AS (SELECT p.event_type, r.r,
             ${CountMinSketch.bucketSql("p.event_type", "r.r", 256)} AS b
           FROM p CROSS JOIN r)
         SELECT event_type, CAST(MIN(cells.cnt) AS BIGINT) AS est
         FROM pb JOIN cells ON cells.r = pb.r AND cells.b = pb.b
         GROUP BY event_type ORDER BY event_type"""
  )
}
