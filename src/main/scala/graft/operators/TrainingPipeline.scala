package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** The end-to-end training-data preparation pipeline — the 100 TB use case
  * every C-category operator exists FOR, composed into one job:
  *
  *   raw corpus → language filter → quality filter → exact dedup →
  *   near-dup (MinHash-LSH) dedup → kept corpus
  *
  * Each stage reuses the exact scoring/dedup logic of its standalone query
  * (stopword set, quality formula, LSH parameters are single-sourced from
  * TextOps/Dedup), so the funnel's numbers are reproducible from the
  * per-operator queries. Output is the funnel itself — documents and
  * tokens surviving each stage — which is the report a data-curation run
  * actually ships.
  *
  * Scale shape: stages 1–2 are one projection pass (no shuffle); exact
  * dedup shuffles 32-byte content hashes; the near-dup stage is the banded
  * LSH of q_dedup_minhash (candidates only from bucket collisions, never
  * all-pairs) scoped to the filtered survivors — filtering BEFORE dedup is
  * deliberate: at 100 TB the expensive stage must see the smallest corpus.
  * Goes beyond the reference (its only text operator is word count,
  * Assignment1/server.c:179-252); mandated by the rebuild brief.
  */
object TrainingPipeline extends QueryModule {

  // Raw scan (no fan-out exchange): stage 1 is a projection pass, and the
  // pipeline's first shuffle should be the dedup hash — same rationale as
  // TextOps.
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.raw(s, dir, "documents")

  /** Stage-2 cut on the (rounded) TextOps quality score — the one constant
    * this pipeline owns; used by the Spark filter AND the oracle. */
  private val qualityCut = 0.5

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The curation funnel: per-stage surviving doc/token counts.
    "q_pipeline_e2e" -> ((s, dir) => {
      // Every stage frame below feeds TWO consumers (its funnel row + the
      // next stage) — materialize each once or the whole prefix pipeline
      // re-executes per consumer (the repo's standing multi-consumer rule).
      // Scoring expressions come from TextOps (the single source shared
      // with q_text_quality / q_text_langid).
      val scored = docs(s, dir)
        .select(col("doc_id"), col("text"), TextOps.nTokC.cast("long").as("n_tok"),
          TextOps.predictsEnC.as("is_en"), TextOps.qualityC.as("q"))
        .localCheckpoint(true)
      // Stage 1 — language filter: keep predicted-English (the
      // q_text_langid 'en' rule).
      val langKept = scored.filter(col("is_en")).localCheckpoint(true)
      // Stage 2 — quality filter on the ROUNDED score (round-before-compare
      // keeps the boundary engine-stable, per the oracle discipline).
      val qualKept = langKept.filter(col("q") >= qualityCut).localCheckpoint(true)
      // Stage 3 — exact dedup: keep the min doc_id per 256-bit content hash
      // (shuffle keys are 32 bytes, never documents).
      val wContent = Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")
      val exactKept = qualKept
        .withColumn("rn", row_number().over(wContent))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint(true)
      // Stage 4 — near-dup dedup: verified LSH pairs among the survivors →
      // connected components (Dedup's shared clustering step) → drop every
      // non-representative member.
      val pairs = Dedup.minhashPairs(exactKept.select("doc_id", "text"))
      val dropped = Dedup.pairComponents(s, pairs)
        .filter(col("v") =!= col("comp"))
        .select(col("v").as("doc_id"))
      val finalKept = exactKept.join(dropped, Seq("doc_id"), "left_anti")

      def funnelRow(stage: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum("n_tok"), lit(0L)).as("n_tokens"))
          .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))

      funnelRow("0_raw", scored)
        .union(funnelRow("1_lang", langKept))
        .union(funnelRow("2_quality", qualKept))
        .union(funnelRow("3_exact", exactKept))
        .union(funnelRow("4_neardup", finalKept))
        .orderBy("stage")
    }),

    // Stratified (class-balanced) downsampling: every language class is cut
    // to the size of the SMALLEST class, members chosen by a portable
    // 60-bit hash of the doc id — deterministic, seedless, reproducible
    // across engines and runs (the property a training-mix builder needs;
    // rerunning on an appended corpus keeps previously sampled docs stable
    // modulo rank). Uses the custom TopKPerKey operator, so rank pruning
    // happens MAP-SIDE: each input partition forwards ≤ n_min rows per
    // class instead of sorting the whole table inside k class-partitions —
    // the scalable spelling of ROW_NUMBER() OVER (PARTITION BY class).
    // Weighted sampling (Efraimidis–Spirakis A-ES): sample 100 documents
    // with probability proportional to token count, deterministically —
    // u = (hash60(doc_id)+1)/2^60 replaces the RNG, key = ln(u)/w, take
    // the k largest keys (u^(1/w) ordering in log space). Embarrassingly
    // parallel: one projection pass + a global top-k that plans as
    // TakeOrderedAndProject — no prefix sums, no single-partition sort
    // (the systematic-sampling alternative needs a global running total,
    // the q_win_range trap). Output carries no float column: both engines
    // compute the same key modulo last-ulp ln differences, which only
    // matter if two keys straddle the k-boundary within one ulp (~1e-12).
    "q_sample_weighted" -> ((s, dir) => {
      val u = (graft.functions.PortableHash.hash60(col("doc_id").cast("string")) + 1)
        .cast("double") / math.pow(2, 60)
      docs(s, dir)
        .select(col("doc_id"), TextOps.nTokC.cast("long").as("n_tok"),
          (log(u) / TextOps.nTokC.cast("double")).as("k"))
        .orderBy(col("k").desc, col("doc_id"))
        .limit(100)
        .select("doc_id", "n_tok")
        .orderBy("doc_id")
    }),

    // Domain-mixture re-weighting — the data-mixing op: downsample to half
    // the corpus with per-source doc quotas proportional to √(source token
    // mass), the sub-linear weighting that keeps heavy domains from
    // swamping the mixture while still favoring them. All quota arithmetic
    // is exact-integer (isqrt via floor∘sqrt — correctly-rounded IEEE on
    // both engines — then integer div), so quotas can never flicker across
    // engines; membership per source = smallest portable-hash ranks, the
    // stratified sampler's discipline. Scale shape: quotas are a 20-row
    // broadcast; the rank window is the only data shuffle.
    "q_sample_mixture" -> ((s, dir) => {
      // counts is 20 rows but feeds BOTH the per-source quota and the
      // global totals — materialize once or the token-sum scan runs twice.
      val counts = docs(s, dir)
        .select(col("source"), TextOps.nTokC.cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("nd"), sum("n_tok").as("ntok"))
        .withColumn("isq", floor(sqrt(col("ntok"))).cast("long"))
        .localCheckpoint(true)
      val tot = counts.agg(sum(col("nd")).as("dtot"), sum(col("isq")).as("sumisq"))
      val quota = counts.crossJoin(tot)
        .select(col("source"),
          least(col("nd"), expr("(dtot div 2) * isq div sumisq")).as("k"))
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      docs(s, dir).select(col("doc_id"), col("source"),
          graft.functions.PortableHash.hash60(col("doc_id").cast("string")).as("h"))
        .withColumn("rk", row_number().over(w))
        .join(broadcast(quota), Seq("source"))
        .filter(col("rk") <= col("k"))
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")
    }),

    "q_sample_stratified" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        graft.functions.PortableHash.hash60(col("doc_id").cast("string")).as("h"))
      // The target size is a runtime scalar (one tiny agg over class
      // counts, collected like any planner statistic), then frozen into
      // the TopKPerKey plan as its literal k.
      val nMin = d.groupBy("lang").count().agg(min("count")).head.getLong(0).toInt
      graft.plans.TopK.perKey(d, nMin, Seq("lang"), Seq(("h", false), ("doc_id", false)))
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    }),

    // Temperature-flattened mixture with epoch repeat-and-trim — the
    // UPSAMPLING half of data mixing (q_sample_mixture only downsamples):
    // per-language weights ∝ n^(1/4) (temperature α = 0.25, flattening the
    // head harder than the mixture query's √ weighting), target doc count
    // per language = total·weight, and the target is MATERIALIZED by
    // repeating every doc floor(target/n) times plus one extra copy for
    // the `target mod n` lowest-hash-ranked docs — so a small language is
    // replayed across multiple epochs while a large one is trimmed, and
    // the output size hits the target exactly. n^(1/4) in exact integers:
    // two floor∘(sqrt·1e3) steps — IEEE sqrt is correctly rounded on both
    // engines, and each floor re-enters exact-integer domain, so weights
    // can never flicker across engines. Scale shape: the quota frame is
    // #langs rows (joined unhinted — a broadcast at any real size); copy
    // fan-out is executor-side explode(sequence), never a driver loop; the
    // per-language rank window is the stratified sampler's discipline.
    "q_sample_temperature" -> ((s, dir) => {
      // counts feeds the total AND the per-lang quota — materialize once.
      val counts = docs(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("nd"))
        .withColumn("s1", floor(sqrt(col("nd")) * 1000).cast("long"))
        .withColumn("s2", floor(sqrt(col("s1")) * 1000).cast("long"))
        .localCheckpoint(true)
      val tot = counts.agg(sum("nd").as("dtot"), sum("s2").as("sum2"))
      val quota = counts.crossJoin(tot)
        .select(col("lang"), col("nd"),
          expr("s2 * 1000000 div sum2").as("weight_e6"),
          expr("dtot * (s2 * 1000000 div sum2) div 1000000").as("target"))
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      val ranked = docs(s, dir).select(col("doc_id"), col("lang"),
          graft.functions.PortableHash.hash60(col("doc_id").cast("string")).as("h"))
        .withColumn("rk", row_number().over(w))
      val copies = ranked.join(quota, Seq("lang"))
        .select(col("lang"), col("doc_id"), col("nd"), col("weight_e6"),
          col("target"),
          (expr("target div nd") +
            when(col("rk") <= col("target") % col("nd"), 1).otherwise(0))
            .cast("long").as("copies"))
      // sequence(1, 0) would DESCEND (Spark steps -1 when start > stop) —
      // zero-copy docs must be filtered out, not exploded empty.
      copies.filter(col("copies") >= 1)
        .select(col("lang"), col("doc_id"), col("nd"), col("weight_e6"),
          col("target"), explode(sequence(lit(1L), col("copies"))).as("epoch"))
        .groupBy("lang")
        .agg(max("nd").as("n_docs"), max("weight_e6").as("weight_e6"),
          max("target").as("target"), count(lit(1)).as("n_out"),
          countDistinct("doc_id").as("n_kept"),
          max("epoch").as("max_copies"))
        .orderBy("lang")
    }),

    // Deterministic train/val/test holdout split (80/10/10): the split is
    // a pure function of the portable doc_id hash (bucket = hash mod 10 →
    // 0–7 train, 8 val, 9 test), so it is stable under corpus appends
    // (existing docs never migrate between splits — the property that
    // keeps a val set honest across dataset versions), reproducible on
    // any engine, and embarrassingly parallel: ONE projection pass, one
    // (lang, split) count shuffle, no RNG state anywhere. Output is the
    // per-language split report a dataset card ships.
    "q_sample_holdout" -> ((s, dir) => {
      val bucket = pmod(
        graft.functions.PortableHash.hash60(col("doc_id").cast("string")),
        lit(10L))
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          TextOps.nTokC.cast("long").as("n_tok"),
          when(bucket <= 7, "train").when(bucket === 8, "val")
            .otherwise("test").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderBy("lang", "split")
    })
  )

  def oracles: Map[String, String] = Map(
    // Built FROM the shared fragments: TextOps scoring SQL for stages 1–2,
    // Dedup's shingle + component CTEs for stage 4 — same single-sourcing
    // as the Spark side.
    "q_pipeline_e2e" ->
      s"""WITH RECURSIVE f AS (
           SELECT doc_id, text,
             CAST(${TextOps.nTokSql} AS BIGINT) AS n_tok,
             ${TextOps.stopRatioSql} AS sr,
             ${TextOps.qualitySql} AS q
           FROM documents),
         lang_kept AS (SELECT * FROM f WHERE sr >= ${TextOps.enThreshold}),
         qual_kept AS (SELECT * FROM lang_kept WHERE q >= $qualityCut),
         exact_kept AS (SELECT doc_id, text, n_tok FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM qual_kept) WHERE rn = 1),
         ${Dedup.shingleCtes("exact_kept", Dedup.lshThreshold.toString)},
         ${Dedup.componentCtes(Dedup.lshThreshold.toString)},
         dropped AS (SELECT v AS doc_id FROM comp WHERE v <> comp),
         final_kept AS (SELECT * FROM exact_kept
           WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
         SELECT * FROM (
           SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens FROM f
           UNION ALL SELECT '1_lang', CAST(COUNT(*) AS BIGINT),
                  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM lang_kept
           UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT),
                  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM qual_kept
           UNION ALL SELECT '3_exact', CAST(COUNT(*) AS BIGINT),
                  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM exact_kept
           UNION ALL SELECT '4_neardup', CAST(COUNT(*) AS BIGINT),
                  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM final_kept)
         ORDER BY stage""",
    "q_sample_weighted" ->
      s"""WITH k AS (SELECT doc_id,
             CAST(${TextOps.nTokSql} AS BIGINT) AS n_tok,
             ln((${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")} + 1)
                / 1152921504606846976.0) / ${TextOps.nTokSql} AS k
           FROM documents)
         SELECT doc_id, n_tok FROM k
         ORDER BY k DESC, doc_id LIMIT 100""",
    "q_sample_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
             ${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")} AS h,
             CAST(${TextOps.nTokSql} AS BIGINT) AS n_tok
           FROM documents),
         c AS (SELECT source, COUNT(*) AS nd,
                 CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS BIGINT))) AS BIGINT) AS isq
               FROM d GROUP BY source),
         t AS (SELECT CAST(SUM(nd) AS BIGINT) AS dtot,
                 CAST(SUM(isq) AS BIGINT) AS sumisq FROM c),
         q AS (SELECT source, LEAST(nd, (dtot // 2) * isq // sumisq) AS k
               FROM c CROSS JOIN t),
         r AS (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
           FROM d)
         SELECT r.source, r.doc_id FROM r JOIN q ON r.source = q.source
         WHERE rk <= k ORDER BY r.source, r.doc_id""",
    "q_sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
             ${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")} AS h
           FROM documents),
         r AS (SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
           FROM h),
         m AS (SELECT MIN(n) AS mn FROM (
             SELECT COUNT(*) AS n FROM documents GROUP BY lang))
         SELECT doc_id, lang FROM r, m WHERE rn <= mn ORDER BY lang, doc_id""",
    // Identical α=0.25 fixed-point chain (floor(sqrt·1e3) twice), identical
    // repeat-and-trim: base copies target//n for every doc, +1 for the
    // target%n lowest-hash ranks, materialized via range() fan-out.
    "q_sample_temperature" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS nd FROM documents GROUP BY lang),
         s AS (SELECT lang, nd,
                 CAST(FLOOR(SQRT(CAST(FLOOR(SQRT(nd) * 1000) AS BIGINT)) * 1000)
                      AS BIGINT) AS s2
               FROM c),
         t AS (SELECT CAST(SUM(nd) AS BIGINT) AS dtot,
                 CAST(SUM(s2) AS BIGINT) AS sum2 FROM s),
         q AS (SELECT lang, nd, s2 * 1000000 // sum2 AS weight_e6,
                 dtot * (s2 * 1000000 // sum2) // 1000000 AS target
               FROM s CROSS JOIN t),
         r AS (SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                   ${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")},
                   doc_id) AS rk
               FROM documents),
         cp AS (SELECT r.lang, r.doc_id, q.nd, q.weight_e6, q.target,
                  q.target // q.nd +
                    (CASE WHEN r.rk <= q.target % q.nd THEN 1 ELSE 0 END) AS copies
                FROM r JOIN q ON r.lang = q.lang),
         m AS (SELECT lang, doc_id, nd, weight_e6, target,
                 unnest(range(1, copies + 1)) AS epoch
               FROM cp WHERE copies >= 1)
         SELECT lang, CAST(MAX(nd) AS BIGINT) AS n_docs,
           CAST(MAX(weight_e6) AS BIGINT) AS weight_e6,
           CAST(MAX(target) AS BIGINT) AS target,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_kept,
           CAST(MAX(epoch) AS BIGINT) AS max_copies
         FROM m GROUP BY lang ORDER BY lang""",
    // Same portable-hash bucket arithmetic; pmod of the non-negative
    // 60-bit hash is plain %.
    "q_sample_holdout" ->
      s"""WITH d AS (SELECT doc_id, lang,
             CAST(${TextOps.nTokSql} AS BIGINT) AS n_tok,
             ${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")} % 10
               AS bucket
           FROM documents)
         SELECT lang,
           CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         FROM d GROUP BY 1, 2 ORDER BY lang, split"""
  )
}
