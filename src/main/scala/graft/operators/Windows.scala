package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryModule, Tables}

/** Window functions: ranking, analytic (lag/lead), aggregate frames,
  * ntile/percent_rank/cume_dist.
  *
  * Closest reference analog: the BFS "level" is a computed rank over
  * traversal order (`Assignment2/secondary_server.c:588-619`) — here the
  * whole ranking/analytic surface is declarative `Window` specs, which
  * Spark executes as a single sort-based window operator per partition
  * spec (one shuffle per distinct partitioning).
  *
  * Every orderBy inside a window spec carries a unique tie-break column so
  * results are deterministic across engines.
  */
object Windows extends QueryModule {

  // Raw scan: every window query's first operator IS the window's
  // partition-key shuffle, so a pre-repartition exchange is pure overhead.
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.raw(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> ((s, dir) => {
      val wUnique = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wTies = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
      t(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        row_number().over(wUnique).as("rn"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"))
        .orderBy("c_custkey")
    }),

    // Distribution window functions — percent_rank/cume_dist (the
    // relative-standing family rank() alone can't express) plus
    // nth_value. ROUND(k/n, 6) sits ON the half boundary whenever n
    // divides a power of ten (41/640 = 0.0640625 — found the hard way at
    // sf0.1), so the doubles are NOT safely roundable; instead the exact
    // integer rank is recovered from the function output
    // (floor(cd·n + 0.5) undoes the division exactly — the quotient is
    // within 1 ulp of k/n) and shipped in e6 fixed point. The extra
    // count window shares the (nationkey) partition key: still one
    // exchange for all four measures.
    "q_win_dist" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        count(lit(1)).over(Window.partitionBy("c_nationkey")).as("n"),
        nth_value(col("c_custkey"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("second_top"))
        .select(col("c_custkey"), col("c_nationkey"),
          // n = 1 guard (r6 ADVICE): a singleton partition makes the
          // divisor 0 — ANSI div would THROW here while DuckDB's // 0
          // yields NULL, so an unguarded fixture regeneration would crash
          // this side instead of diverging loudly; percent_rank of a
          // single row is 0 by definition, which both sides now pin.
          expr("CASE WHEN n > 1 THEN " +
            "CAST(floor(pr * (n - 1) + 0.5) AS BIGINT) * 1000000 div (n - 1) " +
            "ELSE CAST(0 AS BIGINT) END")
            .as("pct_rank_e6"),
          expr("CAST(floor(cd * n + 0.5) AS BIGINT) * 1000000 div n")
            .as("cume_e6"),
          col("second_top"))
        .orderBy("c_custkey")
    }),

    // Running DISTINCT count over a window — an operator Spark does NOT
    // support directly (COUNT(DISTINCT) OVER throws): re-expressed as the
    // first-occurrence-flag trick, flag = row_number()==1 over
    // (user, type), running sum of flags over (user, time). Two window
    // specs → two exchanges, each a plain hash shuffle; state per row is
    // one bit instead of the per-frame distinct set a naive engine keeps.
    "q_win_distinct" -> ((s, dir) => {
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1).otherwise(0))
        .select(col("user_id"), col("event_id"), col("event_type"),
          sum("first_seen").over(wRun).cast("int").as("n_distinct_types"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead("o_totalprice", 1).over(w), 2).as("next_price"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"))
        .orderBy("o_orderkey")
    }),

    "q_win_frames" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val runFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ma3Frame = w.rowsBetween(-2, 0)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        round(sum("o_totalprice").over(runFrame), 2).as("run_total"),
        round(avg("o_totalprice").over(ma3Frame), 4).as("ma3"),
        round(max("o_totalprice").over(runFrame), 2).as("run_max"),
        count(lit(1)).over(Window.partitionBy("o_custkey")).as("n_orders"))
        .orderBy("o_orderkey")
    }),

    // Value windows: first/last/nth within an explicit frame.
    "q_win_value" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        first("o_orderkey").over(full).as("first_order"),
        last("o_orderkey").over(full).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
        .orderBy("o_orderkey")
    }),

    // Value-based RANGE frame: peers within $10k below the current price.
    // Shipped as the BANDED formulation — the naive spelling (one window
    // per o_orderstatus, i.e. 3 partitions for the whole table) is a
    // scale-killer kept only as [[naiveRangeWindow]] for ScaleSpec's
    // equality proof. Here, rows are bucketed into price bands exactly as
    // wide as the frame (10000), so the [p−10000, p] frame spans at most
    // the row's own band and the previous one. Pass 1: per-(status, band)
    // totals. Pass 2: within-band running RANGE count/sum (small
    // partitions), plus a probe row at value p−10000 merged into the
    // PREVIOUS band whose running count/sum (probes sorted before
    // equal-valued data rows) gives the strictly-below-cut prefix —
    // prev-band contribution = band total − prefix. All partitions are
    // (status, band): fine-grained, shuffle-parallel, no 3-group
    // bottleneck.
    "q_win_range" -> ((s, dir) => {
      val W = 10000.0
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("band", floor(col("o_totalprice") / W))
      // In-band part: RANGE frame within the (status, band) partition.
      val wIn = Window.partitionBy("o_orderstatus", "band")
        .orderBy(col("o_totalprice")).rangeBetween(Window.unboundedPreceding, 0)
      val inBand = o
        .withColumn("in_n", count(lit(1)).over(wIn))
        .withColumn("in_sum", sum("o_totalprice").over(wIn))
      // Prev-band part via merged probes: data rows (w=1) + probe rows
      // (w=0) at cut = p − W, keyed into band − 1.
      val data = o.select(col("o_orderstatus"), col("band"),
        col("o_totalprice").as("v"), lit(1L).as("w"),
        lit(null).cast("long").as("probe_key"))
      val probes = o.select(col("o_orderstatus"), (col("band") - 1).as("band"),
        (col("o_totalprice") - W).as("v"), lit(0L).as("w"),
        col("o_orderkey").as("probe_key"))
      val wRun = Window.partitionBy("o_orderstatus", "band")
        .orderBy(col("v"), col("w")).rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("o_orderstatus", "band")
      val merged = data.union(probes)
        .withColumn("below_n", sum(col("w")).over(wRun))
        .withColumn("below_sum", sum(col("v") * col("w").cast("double")).over(wRun))
        .withColumn("tot_n", sum(col("w")).over(wTot))
        .withColumn("tot_sum", sum(col("v") * col("w").cast("double")).over(wTot))
      val prev = merged.filter(col("probe_key").isNotNull)
        .select(col("probe_key").as("o_orderkey"),
          (col("tot_n") - col("below_n")).as("prev_n"),
          (col("tot_sum") - col("below_sum")).as("prev_sum"))
      inBand.join(prev, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("in_n") + col("prev_n")).as("n_in_band"),
          round(col("in_sum") + col("prev_sum"), 2).as("band_total"))
        .orderBy("o_orderkey")
    }),

    "q_win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
    }),

    // SCD type-2 dimension build from a change log: collapse each user's
    // consecutive runs of the same event_type into effective-dated
    // versions (valid_from/valid_to, open version flagged current — the
    // sentinel 2100-01-01 keeps the output NaT-free for comparison). The
    // lag-filter and the lead/row_number run over the SAME (user_id,
    // (ts, event_id)) window spec, so the whole history build is ONE
    // shuffle + sort per the window-collapse rule; at 100 TB this is the
    // standard log→dimension compaction job.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sentinel = lit("2100-01-01 00:00:00").cast("timestamp")
      val changes = t(s, dir, "events")
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", coalesce(lead("ts", 1).over(w), sentinel))
        .select(col("user_id"), col("version"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          (col("valid_to") === sentinel).as("is_current"))
        .orderBy("user_id", "version")
    })
  )

  /** The textbook RANGE-frame spelling of q_win_range: one window per
    * o_orderstatus, so the whole table sorts in 3 partitions. Equivalent to
    * the shipped banded plan (proved row-for-row in ScaleSpec) but a
    * scale-killer at 100×, so it is deliberately NOT a queries/bench entry.
    */
  private[graft] def naiveRangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"))
      .rangeBetween(-10000, 0)
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      count(lit(1)).over(w).as("n_in_band"),
      round(sum("o_totalprice").over(w), 2).as("band_total"))
      .orderBy("o_orderkey")
  }

  def oracles: Map[String, String] = Map(
    "q_win_distinct" ->
      """WITH f AS (SELECT user_id, event_id, event_type,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen,
             ts
           FROM events)
         SELECT user_id, event_id, event_type,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS INT) AS n_distinct_types
         FROM f ORDER BY user_id, event_id""",
    "q_win_rank" ->
      """SELECT c_custkey, c_nationkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn,
         CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
         CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk
         FROM customer ORDER BY c_custkey""",
    "q_win_dist" ->
      """WITH b AS (SELECT c_custkey, c_nationkey,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd,
           COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_top
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
         SELECT c_custkey, c_nationkey,
           CASE WHEN n > 1 THEN
             CAST(FLOOR(pr * (n - 1) + 0.5) AS BIGINT) * 1000000 // (n - 1)
           ELSE CAST(0 AS BIGINT) END AS pct_rank_e6,
           CAST(FLOOR(cd * n + 0.5) AS BIGINT) * 1000000 // n AS cume_e6,
           second_top
         FROM b ORDER BY c_custkey""",
    "q_win_lag" ->
      """SELECT o_orderkey, o_custkey,
         ROUND(LAG(o_totalprice, 1) OVER w, 2) AS prev_price,
         ROUND(LEAD(o_totalprice, 1) OVER w, 2) AS next_price,
         CAST(date_diff('day',
           CAST(LAG(o_orderdate, 1) OVER w AS DATE),
           CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_orderkey""",
    "q_win_frames" ->
      """SELECT o_orderkey, o_custkey,
         ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
         ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
         ROUND(MAX(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_max,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
         FROM orders ORDER BY o_orderkey""",
    "q_win_value" ->
      """SELECT o_orderkey, o_custkey,
         FIRST_VALUE(o_orderkey) OVER w AS first_order,
         LAST_VALUE(o_orderkey) OVER w AS last_order,
         NTH_VALUE(o_orderkey, 2) OVER w AS second_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",
    // The oracle keeps the straightforward RANGE-frame spelling — the
    // shipped banded rewrite must reproduce it bit-for-bit.
    "q_win_range" ->
      """SELECT o_orderkey, o_orderstatus,
         COUNT(*) OVER w AS n_in_band,
         ROUND(SUM(o_totalprice) OVER w, 2) AS band_total
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
         CAST(NTILE(4) OVER w AS INT) AS quartile,
         ROUND(PERCENT_RANK() OVER w, 6) AS pr,
         ROUND(CUME_DIST() OVER w, 6) AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
         c AS (SELECT *, LAG(event_type) OVER w AS prev_type FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         v AS (SELECT user_id, event_id, event_type, ts FROM c
               WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id,
           CAST(ROW_NUMBER() OVER w AS INT) AS version,
           event_type, ts AS valid_from,
           COALESCE(LEAD(ts) OVER w, TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
           COALESCE(LEAD(ts) OVER w, TIMESTAMP '2100-01-01 00:00:00')
             = TIMESTAMP '2100-01-01 00:00:00' AS is_current
         FROM v
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, version"""
  )
}
