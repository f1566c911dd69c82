package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames.
  *
  * Re-expresses the reference's two headline queries Spark-first:
  *
  *  - BFS level-order traversal (`Assignment2/secondary_server.c:480-662`):
  *    the reference's per-level `pthread_join` barrier (`:588-619`) IS a BSP
  *    superstep — here each superstep is one frontier⋈edges shuffle join.
  *    Order within a level was scheduler-nondeterministic in the reference;
  *    we replace that with a deterministic (level, vertex-id) order.
  *
  *  - DFS leaf-node query (`secondary_server.c:189-238,248-435`): the
  *    reference spawns a pthread per DFS branch and its leaf set is
  *    race-dependent (shared `visited[]`, `:203-206`). No deterministic DFS
  *    exists in a BSP model, so we implement the declared *intent*: leaves
  *    of a deterministic traversal tree — the min-parent BFS tree — via a
  *    left-anti join (reachable ∖ parents).
  *
  * Scale posture: frontiers and level sets stay distributed (no driver
  * collect); lineage is cut with `localCheckpoint` every superstep so deep
  * graphs don't blow up plan size (the known scale-killer for iterative
  * DataFrame loops); the per-superstep `count()` is the BSP termination
  * check, equivalent to Pregel's active-vertex count. On a real cluster,
  * `localCheckpoint` would become `checkpoint` on reliable storage.
  */
object GraphOps {

  /** Env-gated phase tracing (`SPARK_GRAFT_TRACE=1`): per-wave frontier
    * sizes + wall time for the iterative loops, on stderr. Zero extra
    * Spark jobs — only counts the loops already compute are reported. */
  private val traceOn: Boolean = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
  private def trace(msg: => String): Unit =
    if (traceOn) System.err.println(s"[graft-trace] $msg")

  /** Rows of accumulated BFS state past which the seen-set anti-join stops
    * being broadcast: ~1M (v: long, level: int) rows ≈ 50 MB of broadcast
    * hash relation — the point where re-shipping the whole seen-set to
    * every executor each superstep costs more than one shuffle of the
    * (much smaller) freshly-grown frontier. */
  val BroadcastSeenLimit: Long = 1000000L

  /** Conservative growth allowance for the SECOND hop of a fused
    * superstep: hop-2's probe side is hop-1's (deduplicated) candidate
    * set, whose size is only known one barrier later — frontierCount is a
    * round stale for it. Forcing a broadcast under the stale count alone
    * would re-open exactly the flooding the gate exists to prevent (a
    * 900k frontier × degree-20 fan-out is an 18M-row forced broadcast),
    * so hop-2 broadcasts only while `frontierCount × this ≤ gate` — a
    * frontier small enough that even this×-fold candidate growth stays
    * inside the gate's intent — and merge-joins otherwise. */
  val FusedHopFanoutAllowance: Long = 8L

  /** One FUSED two-level BFS superstep, exposed for plan-shape tests:
    * grow the frontier TWO hops along `e` (frontier doubling — hop-2 is
    * the hop-1 plan re-joined inside the same job, exactness argued at
    * [[multiGraphExpandTwice]]), then prune already-seen vertices. BOTH
    * joins are size-gated on the row counts the loop already tracks:
    *  - the frontier join broadcasts only while `frontierCount` is under
    *    the gate — on a low-diameter scale-free graph the middle BFS level
    *    is O(|V|), which at billions of vertices would be a multi-GB
    *    forced broadcast; past the gate it flips to a sort-merge join on
    *    src, the formulation that spills instead of flooding every
    *    executor.
    *  - the seen-set anti-join is broadcast only while `seenCount` is under
    *    `broadcastSeenLimit` — past it, seen grows to O(|V|) and the plan
    *    flips to a sort-merge anti-join (shuffle on v). */
  private[graft] def expandTwice(e: DataFrame, f: DataFrame, seen: DataFrame,
      seenCount: Long, broadcastSeenLimit: Long,
      frontierCount: Long = 0L): DataFrame = {
    def hop(fr0: DataFrame, gateCount: Long): DataFrame = {
      val fr = fr0.select(col("v").as("fv"), col("level").as("fl"))
      val fj = if (gateCount <= broadcastSeenLimit) broadcast(fr)
               else fr.hint("merge")
      e.join(fj, e("src") === col("fv"))
        .select(e("dst").as("v"), (col("fl") + 1).cast("int").as("level"))
    }
    // frontier doubling (see [[multiGraphExpandTwice]] for the exactness
    // argument): hop-1 and hop-2 candidates union into one min-level
    // group-by and ONE seen anti-join, so each barrier advances two
    // levels. Hop-2's probe is hop-1 DEDUPLICATED (min-level per vertex —
    // loses nothing, the final group-by takes the min anyway) and its
    // broadcast gate carries the [[FusedHopFanoutAllowance]] because
    // frontierCount is one round stale for it.
    val hop1 = hop(f, frontierCount)
      .groupBy("v").agg(min("level").as("level"))
    val cand = hop1
      .union(hop(hop1, frontierCount * FusedHopFanoutAllowance))
      .groupBy("v").agg(min("level").as("level"))
    if (seenCount <= broadcastSeenLimit)
      cand.join(broadcast(seen.select("v")), Seq("v"), "left_anti")
    else cand.join(seen.select("v").hint("merge"), Seq("v"), "left_anti")
  }

  /** BFS levels from `start` over `edges(src: long, dst: long)`.
    * Returns `(v: long, level: int)` for every reachable vertex.
    */
  def bfsLevels(spark: SparkSession, edges: DataFrame, start: Long, maxIter: Int = 50,
      broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    var levels = Seq((start, 0)).toDF("v", "level")
    var frontier = levels
    var seenCount = 1L
    var frontierCount = 1L
    var i = 0
    var done = false
    // ONE materialization + ONE count per TWO BFS levels (the fused
    // two-hop superstep of expandTwice — frontier doubling, exactness
    // argued at [[multiGraphExpandTwice]]). The count() reads the
    // just-checkpointed frontier (cached RDD, no recompute) — it is the
    // BSP termination check, the running seen-set size, AND the frontier
    // size that drive the broadcast→shuffle flips.
    while (i < maxIter && !done) {
      val next = expandTwice(e, frontier, levels, seenCount,
        broadcastSeenLimit, frontierCount).localCheckpoint(true)
      val n = next.count()
      if (n == 0) done = true
      else {
        seenCount += n
        frontierCount = n
        // Checkpoint the accumulated level set only every few iterations —
        // an eager checkpoint per superstep re-materializes all levels each
        // time (quadratic in depth); the frontier checkpoints above already
        // bound lineage growth to a few unions.
        val u = levels.union(next)
        levels = if (i % 4 >= 2) u.localCheckpoint(true) else u
        frontier = next
      }
      i += 2
    }
    e.unpersist()
    levels
  }

  /** Multi-source BFS: levels from EVERY seed in one iterative loop, state
    * keyed `(seed, v)`. This is the batching that makes per-source graph
    * analytics (closeness/betweenness centrality over a seed sample) scale:
    * one superstep advances ALL sources' frontiers with a single
    * frontier⋈edges join — s sources cost one loop of depth max-diameter,
    * not s sequential loops — and the (seed, v) key spreads the shuffle
    * across sources so no single-source hotspot forms. Same fused
    * two-levels-per-barrier superstep and broadcast→shuffle seen-set gate
    * as [[bfsLevels]].
    * Returns `(seed, v, level)` for every vertex reachable from each seed.
    */
  def multiSourceBfs(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
      maxIter: Int = 50, broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    var levels = seeds.map(s => (s, s, 0)).toDF("seed", "v", "level")
    var frontier = levels
    var seenCount = seeds.size.toLong
    var frontierCount = seeds.size.toLong
    // the same fused two-level superstep as [[expandTwice]], with the
    // seed riding the state key (one min-level group-by + one seen
    // anti-join per TWO levels)
    def expandTwiceSeeded(f: DataFrame, seen: DataFrame): DataFrame = {
      def hop(fr0: DataFrame, gateCount: Long): DataFrame = {
        val fr = fr0.select(col("seed").as("fs"), col("v").as("fv"),
          col("level").as("fl"))
        val fj = if (gateCount <= broadcastSeenLimit) broadcast(fr)
                 else fr.hint("merge")
        e.join(fj, e("src") === col("fv"))
          .select(col("fs").as("seed"), e("dst").as("v"),
            (col("fl") + 1).cast("int").as("level"))
      }
      // hop-2 probes the DEDUPED hop-1 candidates under the stale-count
      // fan-out allowance (see [[FusedHopFanoutAllowance]])
      val hop1 = hop(f, frontierCount)
        .groupBy("seed", "v").agg(min("level").as("level"))
      val cand = hop1
        .union(hop(hop1, frontierCount * FusedHopFanoutAllowance))
        .groupBy("seed", "v").agg(min("level").as("level"))
      val pruned =
        if (seenCount <= broadcastSeenLimit)
          cand.join(broadcast(seen.select("seed", "v")), Seq("seed", "v"), "left_anti")
        else cand.join(seen.select("seed", "v").hint("merge"), Seq("seed", "v"), "left_anti")
      pruned.localCheckpoint(true)
    }
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = expandTwiceSeeded(frontier, levels)
      val n = next.count()
      if (n == 0) done = true
      else {
        seenCount += n
        frontierCount = n
        val u = levels.union(next)
        levels = if (i % 4 >= 2) u.localCheckpoint(true) else u
        frontier = next
      }
      i += 2
    }
    e.unpersist()
    levels
  }

  /** One FUSED two-level [[multiGraphBfs]] superstep, exposed (like
    * [[expandTwice]]) so ScaleSpec can assert the scale invariants
    * directly: the frontier join keys on BOTH (graph, src) — a graph-only
    * key would funnel each whole graph through one task — and both the
    * frontier and seen-set joins flip broadcast → shuffle past the size
    * gate. The fusion is classic frontier doubling: hop-1 candidates
    * (frontier level + 1) and hop-2 candidates (level + 2, the hop-1
    * plan re-joined against the edges INSIDE the same job) union into one
    * min-level group-by and ONE seen anti-join, so each barrier advances
    * TWO BFS levels — exact, because a vertex at true distance d is
    * unreachable by any walk shorter than d (labels never undershoot) and
    * its shortest-path predecessor chain puts a label-exact parent in the
    * frontier of round ⌈d/2⌉ (the exact label is always among the
    * candidates the min picks from). Hop-2 re-expands the DEDUPLICATED
    * not-yet-pruned hop-1 candidate set under the
    * [[FusedHopFanoutAllowance]] broadcast gate — the price of halving
    * the barrier count, cheap next to a materialization at every
    * level. */
  private[graft] def multiGraphExpandTwice(e: DataFrame, f: DataFrame,
      seen: DataFrame, seenCount: Long, broadcastSeenLimit: Long,
      frontierCount: Long): DataFrame = {
    def hop(fr0: DataFrame, gateCount: Long): DataFrame = {
      val fr = fr0.select(col("graph").as("fg"), col("v").as("fv"),
        col("level").as("fl"))
      val fj = if (gateCount <= broadcastSeenLimit) broadcast(fr)
               else fr.hint("merge")
      e.join(fj, e("graph") === col("fg") && e("src") === col("fv"))
        .select(e("graph"), e("dst").as("v"),
          (col("fl") + 1).cast("int").as("level"))
    }
    // hop-2 probes the DEDUPED hop-1 candidates under the stale-count
    // fan-out allowance (see [[FusedHopFanoutAllowance]])
    val hop1 = hop(f, frontierCount)
      .groupBy("graph", "v").agg(min("level").as("level"))
    val cand = hop1
      .union(hop(hop1, frontierCount * FusedHopFanoutAllowance))
      .groupBy("graph", "v").agg(min("level").as("level"))
    if (seenCount <= broadcastSeenLimit)
      cand.join(broadcast(seen.select("graph", "v")), Seq("graph", "v"), "left_anti")
    else
      cand.join(seen.select("graph", "v").hint("merge"), Seq("graph", "v"), "left_anti")
  }

  /** Per-graph BFS levels for EVERY graph in ONE BSP job — the scale
    * analog of the reference's load balancer fanning graph queries across
    * secondary servers (`load_balancer.c:183-206`): instead of one job
    * per graph (per-graph scheduling overhead, idle executors while a
    * small graph drains), the state is keyed `(graph, v)` and a single
    * superstep advances ALL graphs' frontiers with one frontier⋈edges
    * join — the [[multiSourceBfs]] discipline with the graph id as the
    * batching key, so the shuffle spreads across graphs and no per-graph
    * hotspot forms. Graphs finish at different depths naturally: a
    * drained graph simply stops contributing frontier rows while deeper
    * ones keep iterating, and the loop ends when every graph is done.
    *
    * `edges` is `(graph, src, dst)` (graph id of any orderable type);
    * `start` must be a vertex of every graph (it seeds each one).
    * Returns `(graph, v, level)` for every vertex reachable from `start`
    * within its graph.
    */
  def multiGraphBfs(spark: SparkSession, edges: DataFrame, start: Long,
      maxIter: Int = 50, broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    val e = edges.select(col("graph"),
      col("src").cast("long"), col("dst").cast("long")).persist()
    var levels = e.select("graph").distinct()
      .select(col("graph"), lit(start).as("v"), lit(0).as("level"))
      .localCheckpoint(true)
    var frontier = levels
    var seenCount = levels.count()
    var frontierCount = seenCount
    var i = 0
    var done = false
    // ONE materialization + ONE count per TWO BFS levels (the fused
    // two-hop superstep) — the loop's cost is barrier-bound, so halving
    // the barrier count is the lever that matters at local[32] and on a
    // real cluster alike.
    while (i < maxIter && !done) {
      val next = multiGraphExpandTwice(e, frontier, levels, seenCount,
        broadcastSeenLimit, frontierCount).localCheckpoint(true)
      val n = next.count()
      if (n == 0) done = true
      else {
        seenCount += n
        frontierCount = n
        val u = levels.union(next)
        levels = if (i % 4 >= 2) u.localCheckpoint(true) else u
        frontier = next
      }
      i += 2
    }
    e.unpersist()
    levels
  }

  /** BFS levels via GraphX Pregel — the alternate formulation of
    * [[bfsLevels]] (identical output). Pregel's superstep barrier is the
    * exact Spark-native analog of the reference's per-level `pthread_join`
    * (`secondary_server.c:601-618`): vertex program = min-level merge,
    * messages flow along out-edges only while they improve the level.
    * RDD-based (GraphX), so used as the cross-check implementation; the
    * DataFrame loop stays the Catalyst-optimizable default.
    */
  def bfsLevelsPregel(spark: SparkSession, edges: DataFrame, start: Long, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.graphx.{Edge, EdgeDirection, Graph}
    import spark.implicits._
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    // vertex set = edge endpoints ∪ {start} (start may be isolated)
    val vRdd = edgeRdd.flatMap(e => Iterator(e.srcId, e.dstId))
      .union(spark.sparkContext.parallelize(Seq(start)))
      .distinct().map(v => (v, ()))
    val g = Graph(vRdd, edgeRdd)
      .mapVertices((id, _) => if (id == start) 0 else Int.MaxValue)
    val res = g.pregel(Int.MaxValue, maxIter, EdgeDirection.Out)(
      (_, attr, msg) => math.min(attr, msg),
      t => if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Int.MaxValue).toDF("v", "level")
  }

  /** Leaves of the deterministic min-parent BFS tree from `start`:
    * parent(u) = min{v : level(v) = level(u) − 1, (v,u) ∈ E}; a reachable
    * vertex is a leaf iff it is nobody's parent. Returns `(v, level)`.
    */
  def bfsTreeLeaves(spark: SparkSession, edges: DataFrame, start: Long, maxIter: Int = 50): DataFrame =
    // levels materialized once or the whole BFS loop re-executes per consumer
    bfsTreeLeavesFrom(bfsLevels(spark, edges, start, maxIter).localCheckpoint(true), edges)

  /** [[bfsTreeLeaves]] over an ALREADY-COMPUTED level frame `(v, level)` —
    * lets callers reuse a shared/cached traversal (the σ-BFS cache) for
    * the parent extraction instead of re-running the BFS loop. `levels`
    * is consumed three times; pass a materialized frame. */
  def bfsTreeLeavesFrom(levels: DataFrame, edges: DataFrame): DataFrame = {
    val ls = levels.select(col("v").as("sv"), col("level").as("slevel"))
    val ld = levels.select(col("v").as("dv"), col("level").as("dlevel"))
    val parents = edges
      .join(ls, col("src") === col("sv"))
      .join(ld, col("dst") === col("dv") && col("dlevel") === col("slevel") + 1)
      .groupBy(col("dst"))
      .agg(min("src").as("parent"))
      .select(col("parent").as("v")).distinct()
    levels.join(parents, Seq("v"), "left_anti")
  }

  /** Static PageRank, GraphX formulation: `pr_0 = 1.0`,
    * `pr_{t+1}(v) = 0.15 + 0.85 · Σ_{(u,v)∈E} pr_t(u)/outdeg(u)`, a fixed
    * number of iterations, multi-edges counted with multiplicity, no
    * dangling-mass redistribution. One shuffle per iteration (contribution
    * aggregation on dst); ranks/degrees are broadcastable at moderate |V|.
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iterations: Int = 10): DataFrame =
    rankLoop(spark, edges, iterations, init = lit(1.0), teleport = lit(0.15))

  /** Personalized PageRank from a single seed: the random walk restarts at
    * `seed` instead of teleporting uniformly — `pr_0(v) = 1[v=seed]`,
    * `pr_{t+1}(v) = 0.15·1[v=seed] + 0.85 · Σ pr_t(u)/outdeg(u)`. The
    * standard single-seed proximity measure (recommendation / local-cluster
    * seedsets); identical plan shape and cost to [[pageRank]].
    */
  def personalizedPageRank(spark: SparkSession, edges: DataFrame, seed: Long,
      iterations: Int = 10): DataFrame = {
    val isSeed = (v: Column) => when(v === seed, lit(1.0)).otherwise(lit(0.0))
    rankLoop(spark, edges, iterations,
      init = isSeed(col("v")), teleport = lit(0.15) * isSeed(col("v")))
  }

  /** Weighted PageRank: a random surfer follows out-edge (u,v) with
    * probability w(u,v)/Σw(u,·), so `pr_{t+1}(v) = 0.15 + 0.85 ·
    * Σ_{(u,v)∈E} pr_t(u)·w(u,v)/wout(u)` — the multigraph/affinity-graph
    * parity the unweighted family lacks (edge weight = interaction count,
    * similarity score, …). Same plan shape and cost as [[pageRank]]: the
    * shared [[rankLoop]] reads the `w` column when present (an unweighted
    * edge list is the w≡1 special case, bit-identical to [[pageRank]]).
    */
  def weightedPageRank(spark: SparkSession, edges: DataFrame,
      iterations: Int = 10): DataFrame = {
    require(edges.columns.contains("w"), "weightedPageRank needs a w column")
    rankLoop(spark, edges, iterations, init = lit(1.0), teleport = lit(0.15))
  }

  /** Shared power-iteration loop: `init`/`teleport` are expressions over the
    * vertex column `v`, so uniform PageRank and seed-personalized PageRank
    * are the same plan with different teleport vectors; a `w` edge column,
    * when present, weights each contribution (out-mass w/Σw instead of
    * 1/outdeg — [[weightedPageRank]]). The unweighted path multiplies by
    * the literal 1.0, which is float-exact, so it stays bit-identical to
    * the pre-weight formulation.
    */
  /** WARM-START PageRank — the rank-family consumer of snapshot deltas
    * (the "delta PageRank" of the incremental-maintenance family, with an
    * honest contract): resume the power iteration on the NEW edge set
    * from the PREVIOUS snapshot's stored ranks instead of from the
    * uniform vector. Unlike CC/BFS/triangle maintenance there is no exact
    * state+delta shortcut — PageRank's fixpoint moves globally under any
    * edge change — but the geometric convergence of the power method
    * makes warm-starting the right maintenance: the residual after k
    * warm iterations is 0.85^k × the previous fixpoint's residual on the
    * new graph, which a small delta keeps small, so a handful of
    * iterations recovers what a cold start needs its full budget for
    * (pinned numerically in GraphSpec: 3 warm iterations land closer to
    * the new fixpoint than 3 cold ones). Vertices unseen by the previous
    * state initialize at 1.0, exactly as a cold start would treat them.
    * The semantics are deterministic — prev ranks in, k exact recurrence
    * steps out — so q_graph_pagerank_incremental hash-compares against
    * the identical recurrence unrolled in SQL.
    */
  def pageRankWarmStart(spark: SparkSession, edges: DataFrame,
      prevRanks: DataFrame, iterations: Int = 3): DataFrame =
    rankLoop(spark, edges, iterations, init = lit(1.0),
      teleport = lit(0.15), initFrom = Some(prevRanks))

  private def rankLoop(spark: SparkSession, edges: DataFrame, iterations: Int,
      init: Column, teleport: Column,
      initFrom: Option[DataFrame] = None): DataFrame = {
    val ew = if (edges.columns.contains("w")) col("w").cast("long") else lit(1L)
    val e = edges.select(col("src").cast("long").as("esrc"),
      col("dst").cast("long").as("edst"), ew.as("ew")).persist()
    // ONE materialization serves both verts and deg: at 10 iterations the
    // two frames are consumed 20+ times, and the rank loop has no data
    // dependency that needs them separate. deg left-joined under verts
    // (dangling vertices → null outdeg, never contribute) keeps a single
    // cached frame.
    val vdeg = e.select(col("esrc").as("v")).union(e.select(col("edst").as("v")))
      .distinct()
      .join(e.groupBy(col("esrc").as("dv")).agg(sum("ew").as("outdeg")),
        col("v") === col("dv"), "left")
      .select(col("v"), col("outdeg"))
      .localCheckpoint(true)
    var ranks = initFrom match {
      case None => vdeg.select(col("v"), init.as("pr"), col("outdeg"))
      case Some(p) =>
        // warm start: previous ranks where the vertex was known, the cold
        // init where it is new to this snapshot
        vdeg.join(p.select(col("v").as("pv"), col("pr").as("ppr")),
            col("v") === col("pv"), "left")
          .select(col("v"), coalesce(col("ppr"), init).as("pr"), col("outdeg"))
    }
    for (i <- 0 until iterations) {
      val contribs = ranks.filter(col("outdeg").isNotNull)
        .join(e, col("v") === col("esrc"))
        .groupBy(col("edst").as("cv"))
        .agg(sum(col("pr") * col("ew") / col("outdeg")).as("contrib"))
      val next = vdeg.join(contribs, vdeg("v") === col("cv"), "left")
        .select(vdeg("v"),
          (teleport + lit(0.85) * coalesce(col("contrib"), lit(0.0))).as("pr"),
          col("outdeg"))
      // Checkpoint every 3rd superstep, not every one: each eager
      // localCheckpoint is a full materialization barrier whose fixed cost
      // dominates at bench scale (the r4 graph-trio regression); three
      // iterations of join→agg lineage is well inside plan-size limits.
      ranks = if (i % 3 == 2 || i == iterations - 1) next.localCheckpoint(true) else next
    }
    e.unpersist()
    ranks.select("v", "pr")
  }

  /** [[bfsSigma]] with every seed advancing in the same superstep, state
    * keyed `(seed, v)` — the same batching as [[multiSourceBfs]], carrying
    * shortest-path counts: `(seed, v, level, sigma)`. s seeds cost ONE
    * loop's worth of supersteps, not s loops — the precondition for
    * sampled (multi-source) betweenness at scale.
    */
  private[graft] def multiSourceBfsSigma(spark: SparkSession, edges: DataFrame,
      seeds: Seq[Long], maxIter: Int = 50,
      broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    var levels = seeds.map(s => (s, s, 0, 1L)).toDF("seed", "v", "level", "sigma")
    var frontier = levels
    var seenCount = seeds.size.toLong
    var frontierCount = seeds.size.toLong
    def expand(f: DataFrame, seen: DataFrame, level: Int): DataFrame = {
      val fj = if (frontierCount <= broadcastSeenLimit) broadcast(f) else f.hint("merge")
      val grown = e.join(fj, f("v") === e("src"))
        .groupBy(col("seed"), e("dst").as("v")).agg(sum(f("sigma")).as("sigma"))
      val pruned =
        if (seenCount <= broadcastSeenLimit)
          grown.join(broadcast(seen.select("seed", "v")), Seq("seed", "v"), "left_anti")
        else grown.join(seen.select("seed", "v").hint("merge"), Seq("seed", "v"), "left_anti")
      pruned.select(col("seed"), col("v"), lit(level).as("level"), col("sigma"))
        .localCheckpoint(true)
    }
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next1 = expand(frontier, levels, i + 1)
      val n1 = next1.count()
      if (n1 == 0) done = true
      else {
        seenCount += n1
        frontierCount = n1
        val seen1 = levels.union(next1)
        val next2 = expand(next1, seen1, i + 2)
        val n2 = next2.count()
        seenCount += n2
        frontierCount = n2
        val u = seen1.union(next2)
        levels = if (i % 4 >= 2) u.localCheckpoint(true) else u
        if (n2 == 0) done = true else frontier = next2
      }
      i += 2
    }
    e.unpersist()
    levels
  }

  /** Sampled betweenness centrality: Brandes' dependency accumulation run
    * for a SAMPLE of sources in one batched computation — the standard
    * estimator (Brandes–Pich) whose per-vertex score is the sum of
    * per-source dependencies δ_s(v), s ≠ v. Both sweeps are batched the
    * way [[multiSourceBfs]] batches closeness: σ BFS advances all seeds
    * per superstep keyed (seed, v), and the backward sweep processes level
    * l of EVERY seed's DAG in the same per-level join (seeds at different
    * depths simply contribute no rows at levels they don't have). s seeds
    * therefore cost one forward + one backward loop — not s independent
    * Brandes passes — which is what makes sampling viable on a big graph.
    * Returns `(v, bc)` for every vertex reached by any seed.
    */
  def multiSourceBrandes(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
      maxIter: Int = 50): DataFrame = {
    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val sigAll = multiSourceBfsSigma(spark, ed, seeds, maxIter).localCheckpoint(true)
    multiBrandesBackward(spark, ed, sigAll)
  }

  /** The backward (dependency-accumulation) half of [[multiSourceBrandes]],
    * callable with a PRECOMPUTED `(seed, v, level, sigma)` frame — the
    * forward σ-BFS is the expensive shared half, so a caller that already
    * has it (e.g. a process-level cache shared with the single-source
    * query, whose σ frame is the seed-0 slice of this one) pays only the
    * per-level sweep here. `ed` must be the DISTINCT long-cast edges the
    * σ frame was computed over. */
  /** Per-(seed, vertex) dependency deltas of the batched backward sweep —
    * the shared intermediate BOTH betweenness queries consume: the multi
    * query aggregates it over seeds ([[multiBrandesFinal]]), the
    * single-source query reads its seed-0 slice (per-seed recursion is
    * independent, so the slice IS the single-source sweep). */
  private[graft] def multiBrandesDeltas(spark: SparkSession, ed: DataFrame,
      sigAll: DataFrame): DataFrame = {
    import spark.implicits._
    val maxL = sigAll.agg(max("level")).collect()(0).getInt(0)
    // Annotate each seed's Brandes DAG once (edge (x,w) with level(w) =
    // level(x)+1 under that seed), exactly like the single-source sweep.
    val dagEdges = ed
      .join(sigAll.select(col("seed"), col("v").as("xv"),
        col("level").as("xlevel"), col("sigma").as("xsigma")), col("src") === col("xv"))
      .join(sigAll.select(col("seed").as("wseed"), col("v").as("wv"),
        col("level").as("wlevel"), col("sigma").as("wsigma")),
        col("seed") === col("wseed") && col("dst") === col("wv") &&
          col("wlevel") === col("xlevel") + 1)
      .select(col("seed"), col("src"), col("dst"), col("xlevel"),
        col("xsigma"), col("wsigma"))
      .localCheckpoint(true)
    var delPrev = Seq.empty[(Long, Long, Double)].toDF("dseed", "dv", "delta")
    var dels = List.empty[DataFrame]
    for (l <- (maxL - 1) to 0 by -1) {
      val cur0 = dagEdges.filter(col("xlevel") === l)
        .join(delPrev, col("seed") === col("dseed") && col("dst") === col("dv"), "left")
        .groupBy(col("seed"), col("src"))
        .agg(sum(col("xsigma").cast("double") / col("wsigma").cast("double") *
          (lit(1.0) + coalesce(col("delta"), lit(0.0)))).as("delta"))
        .select(col("seed").as("dseed"), col("src").as("dv"), col("delta"))
      val cur = if (l % 3 == 0 || l == 0) cur0.localCheckpoint(true) else cur0
      dels ::= cur
      delPrev = cur
    }
    dels match {
      case Nil => delPrev
      case ds  => ds.reduce(_ union _)
    }
  }

  /** Sampled-betweenness readout over [[multiBrandesDeltas]]' output:
    * Σ_seeds δ_s(v), each source's own row excluded, rounded e4
    * (r13 VERDICT #8: double-summation compares round at 4, not 6, so a
    * partition-order half-ulp cannot flip the compare). */
  private[graft] def multiBrandesFinal(sigAll: DataFrame, delAll: DataFrame): DataFrame =
    sigAll.select("v").distinct()
      .join(delAll.filter(col("dv") =!= col("dseed"))
        .groupBy(col("dv")).agg(sum("delta").as("bc")),
        col("v") === col("dv"), "left")
      .select(col("v"), round(coalesce(col("bc"), lit(0.0)), 4).as("bc"))

  private[graft] def multiBrandesBackward(spark: SparkSession, ed: DataFrame,
      sigAll: DataFrame): DataFrame =
    multiBrandesFinal(sigAll, multiBrandesDeltas(spark, ed, sigAll))

  /** Longest-path layering of a DAG — the topological-depth assignment a
    * DAG scheduler (build system, lineage planner, workflow engine) uses:
    * sources sit at layer 0, every other vertex at 1 + max over in-edges.
    * Distributed KAHN WAVE PEEL: round r peels the vertices whose
    * in-degree among unpeeled vertices has reached 0 — which happens
    * exactly when all predecessors are peeled, so the peel round IS the
    * longest-path layer. Every vertex is finalized ONCE (unlike a
    * Bellman-Ford-with-max loop, which re-improves vertices up to depth
    * times) and each round costs one edges⋈sources join + one in-degree
    * update materialization. Requires an acyclic input: a round that
    * peels nothing while vertices remain THROWS rather than returning
    * silently-truncated layers.
    * Size-gated like [[connectedComponents]]: a ≤`driverSolveLimit`-edge
    * graph is solved with one driver-side Kahn pass (same loud cycle
    * failure), because the BSP loop's per-round barrier cost dwarfs
    * the work below that size. Returns `(v, layer)` for every vertex.
    */
  def dagLayers(spark: SparkSession, edges: DataFrame, maxIter: Int = 100,
      broadcastSeenLimit: Long = BroadcastSeenLimit,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    // Size gate (the [[connectedComponents]] discipline — the count
    // doubles as the gate and materializes the persist): longest-path
    // depth d costs the BSP loop O(d) synchronous barriers whose FIXED
    // scheduling cost dwarfs the work on a small graph — a ≤1M-edge DAG
    // solves on the driver in milliseconds with one Kahn pass, including
    // the same loud cycle failure. Past the gate the improvement-frontier
    // loop below is the scale path (spec'd equal to this one with the
    // gate forced to 0 in GraphSpec).
    val edgeCount = e.count()
    if (edgeCount <= driverSolveLimit) {
      import spark.implicits._
      val arr = e.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      val indeg = scala.collection.mutable.LongMap.empty[Long]
      val adj = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      val verts = scala.collection.mutable.LinkedHashSet.empty[Long]
      arr.foreach { case (s, d) =>
        verts += s; verts += d
        indeg(d) = indeg.getOrElse(d, 0L) + 1
        adj.getOrElseUpdate(s, scala.collection.mutable.ArrayBuffer.empty) += d
      }
      val layer = scala.collection.mutable.LongMap.empty[Long]
      val queue = scala.collection.mutable.Queue.empty[Long]
      verts.foreach { v => if (indeg.getOrElse(v, 0L) == 0L) { layer(v) = 0L; queue += v } }
      var processed = 0L
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        processed += 1
        adj.getOrElse(v, Nil).foreach { w =>
          layer(w) = math.max(layer.getOrElse(w, 0L), layer(v) + 1)
          indeg(w) = indeg(w) - 1
          if (indeg(w) == 0L) queue += w
        }
      }
      e.unpersist()
      if (processed < verts.size) throw new IllegalStateException(
        s"dagLayers: ${verts.size - processed} vertices lie on or behind a " +
          "cycle - the input is not a DAG")
      return verts.toSeq.sorted.map(v => (v, layer(v))).toDF("v", "layer")
    }
    // Distributed KAHN WAVE PEEL — the same algorithm as the driver gate,
    // expressed as BSP rounds (r8: replaces the r7 Bellman-Ford-with-max
    // improvement loop, which re-improved vertices up to depth times and
    // paid 2 joins + an overlay + an anti-join merge per hop; MEASURED
    // 7.6 s vs 4.4 s for this peel at sf0.1-forced-BSP). Invariant: a
    // vertex's in-degree among UNPEELED vertices reaches 0 exactly when
    // all its predecessors are peeled, so the round at which it peels IS
    // its longest-path layer. Each round costs ONE materialization (the
    // updated in-degree table) + one count: sources fall out of the
    // checkpointed frame by a free filter, every vertex is finalized
    // exactly once, and the result is a lazy union of the per-round
    // source waves over the live checkpoints. Cycle detection is exact:
    // if no vertex peeled this round (remaining unchanged), every
    // remaining vertex lies on or behind a cycle — throw, never truncate.
    def gated(f: DataFrame, n: Long): DataFrame =
      if (n <= broadcastSeenLimit) broadcast(f) else f.hint("merge")
    // One peel round: wave = in-degree-0 rows of `cur`; returns the
    // updated in-degree table with the wave removed and its out-edge
    // counts subtracted. `remaining` upper-bounds |wave| for the
    // broadcast gate (the BFS seen-set discipline).
    def peel(cur: DataFrame, rem: Long, round: Int): (DataFrame, DataFrame) = {
      val wave = cur.filter(col("d") === 0L)
        .select(col("v"), lit(round.toLong).as("layer"))
      val dec = e.join(gated(wave.select(col("v").as("sv")), rem),
          col("src") === col("sv"))
        .groupBy(col("dst").as("dv")).agg(count(lit(1)).as("c"))
      val next = cur.filter(col("d") > 0L)
        .join(dec, col("v") === col("dv"), "left")
        .select(col("v"), (col("d") - coalesce(col("c"), lit(0L))).as("d"))
      (wave, next)
    }
    val dstDeg = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("d"))
    var indeg = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct()
      .join(dstDeg, Seq("v"), "left")
      .select(col("v"), coalesce(col("d"), lit(0L)).as("d"))
      .localCheckpoint(true)
    var remaining = indeg.count()
    val waves = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    // ONE peel round per materialization. Two-rounds-per-checkpoint (the
    // r6/r7 barrier-batching lesson) was tried here and MEASURED SLOWER
    // (6.9 s vs 4.4 s at sf0.1-forced-BSP): the mid-round in-degree frame
    // is consumed by a broadcast exchange AND two filters, and a lazily
    // persist()ed frame races its own cache population across those jobs,
    // recomputing the round instead of sharing it — the batching saved 9
    // barriers but paid ~18 recomputed joins. The honest shape is one
    // checkpoint+count per layer; each wave is a free filter over a live
    // checkpoint, so the final union needs no extra materialization.
    while (remaining > 0 && round < maxIter) {
      val (wave, next0) = peel(indeg, remaining, round)
      waves += wave
      val next = next0.localCheckpoint(true)
      val nextRemaining = next.count()
      if (nextRemaining == remaining) {
        // no source peeled: nothing left has in-degree 0
        e.unpersist()
        throw new IllegalStateException(
          s"dagLayers: $remaining vertices lie on or behind a cycle - the " +
            "input is not a DAG")
      }
      indeg = next
      remaining = nextRemaining
      round += 1
    }
    e.unpersist()
    if (remaining > 0) throw new IllegalStateException(
      s"dagLayers did not converge in $maxIter rounds with $remaining " +
        "vertices unpeeled - longest path exceeds the cap or the input has a cycle")
    waves.reduce(_ union _)
  }

  /** HITS (hubs & authorities), Kleinberg's mutual-reinforcement power
    * iteration: `auth(v) = Σ_{(u,v)∈E} hub(u)` then `hub(u) = Σ_{(u,v)∈E}
    * auth(v)`, normalized by the MAX score (not L2/L1: max over doubles is
    * order-independent and therefore exactly reproducible across engines
    * and shuffle orders, while a distributed 15k-term double sum is not —
    * the converged direction is the same principal eigenvector either
    * way). Normalization is DEFERRED to one final divide (r7 perf): both
    * half-steps are linear maps, so a global scalar divide commutes
    * through them — the final max-normalized vectors are identical to the
    * per-half-step-normalized recurrence — and deferring it removes the
    * two materialize+broadcast-max barriers every half-step paid (the
    * bench cost was ~12 synchronous jobs for 5 iterations; now ~4).
    * Magnitude growth is bounded: raw scores grow ~(mean degree)² per
    * iteration, ~9^5 here — nowhere near double overflow at any sane
    * iteration count. Per iteration: two vertex-keyed shuffle aggs, the
    * same cost class as one PageRank superstep (×2). Requires at least
    * one edge (max of an empty score set is undefined).
    */
  def hits(spark: SparkSession, edges: DataFrame, iterations: Int = 5,
      warmFrom: Option[DataFrame] = None,
      normBy: Option[Column] = None): DataFrame = {
    val e = edges.select(col("src").cast("long").as("esrc"),
      col("dst").cast("long").as("edst")).persist()
    val verts = e.select(col("esrc").as("v")).union(e.select(col("edst").as("v")))
      .distinct().localCheckpoint(true)
    // one RAW half-step: aggregate `from` over the joined edge end,
    // left-join under verts (sinks/sources score 0) — no normalization,
    // no materialization (the divide is deferred to the very end)
    def halfRaw(scores: DataFrame, from: String, joinKey: String,
        groupKey: String, out: String): DataFrame =
      verts.join(
          scores.join(e, col("v") === col(joinKey))
            .groupBy(col(groupKey).as("gv")).agg(sum(from).as("raw")),
          col("v") === col("gv"), "left")
        .select(col("v"), coalesce(col("raw"), lit(0.0)).as(out))
    // warm start (r11 advice): seed from a prior run's (v, auth, hub)
    // instead of uniform 1.0 — vertices absent from the warm frame
    // (new arrivals) fall back to 1.0. Because both half-steps are
    // linear maps with deferred normalization, a warm vector that is
    // already the principal eigenvector stays on it (power iteration
    // from a converged direction is a fixpoint up to the final scalar
    // divide), so incremental re-runs converge in fewer iterations.
    var scores = warmFrom match {
      case Some(w) => verts.join(
          w.select(col("v").cast("long").as("wv"),
            col("auth").cast("double").as("wa"),
            col("hub").cast("double").as("wh")),
          col("v") === col("wv"), "left")
        .select(col("v"), coalesce(col("wa"), lit(1.0)).as("auth"),
          coalesce(col("wh"), lit(1.0)).as("hub"))
        .localCheckpoint(true)
      case None => verts.select(col("v"), lit(1.0).as("auth"), lit(1.0).as("hub"))
        .localCheckpoint(true)
    }
    for (i <- 1 to iterations) {
      val auth = halfRaw(scores, "hub", "esrc", "edst", "auth")
      val hub = halfRaw(auth, "auth", "edst", "esrc", "hub")
      val next = auth.join(hub, "v")
      // checkpoint cadence bounds lineage to two iterations of join+agg
      scores = if (i % 2 == 0 || i == iterations) next.localCheckpoint(true) else next
    }
    e.unpersist()
    // ONE final max-normalization per score family (commutes with the
    // linear half-steps — see scaladoc). With `normBy` (r15, the paired
    // state builders' disjoint-union runs) the max is taken PER GROUP of
    // the given vertex expression — the same single divide per value as
    // the global path, so each group's scores equal a solo run's exactly.
    normBy match {
      case None =>
        scores.crossJoin(broadcast(
            scores.agg(max("auth").as("ma"), max("hub").as("mh"))))
          .select(col("v"), (col("auth") / col("ma")).as("auth"),
            (col("hub") / col("mh")).as("hub"))
      case Some(g) =>
        val sc = scores.withColumn("ng", g)
        sc.join(broadcast(sc.groupBy("ng")
            .agg(max("auth").as("ma"), max("hub").as("mh"))), "ng")
          .select(col("v"), (col("auth") / col("ma")).as("auth"),
            (col("hub") / col("mh")).as("hub"))
    }
  }

  /** Per-edge Jaccard vertex similarity |N(a)∩N(b)| / |N(a)∪N(b)| over the
    * undirected view of `edges` — the link-prediction / graph-cleaning
    * primitive. Common neighbors come from ONE wedge self-join on the
    * symmetric neighbor list (shuffle keys = vertex ids, never all-pairs);
    * the score is exact e6 fixed point (integer division), so no float
    * drift between engines. Returns `(a, b, jaccard_e6)` with a < b.
    */
  def jaccardEdges(spark: SparkSession, edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    // symmetric neighbor list, checkpointed: consumed by the degree agg
    // and both legs of the wedge join
    val nbr = und.select(col("a").as("v"), col("b").as("w"))
      .union(und.select(col("b").as("v"), col("a").as("w")))
      .distinct().localCheckpoint(true)
    val deg = nbr.groupBy("v").agg(count(lit(1)).as("d"))
    val inter = und
      .join(nbr.select(col("v").as("a"), col("w")), "a")
      .join(nbr.select(col("v").as("b"), col("w")), Seq("b", "w"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    und.join(inter, Seq("a", "b"), "left").na.fill(0L, Seq("inter"))
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        expr("inter * 1000000 div (da + db - inter)").as("jaccard_e6"))
  }

  /** Single-source shortest paths over weighted edges
    * `(src: long, dst: long, w: long)`, positive weights — delta-stepping-
    * style Bellman-Ford: only vertices whose distance improved last round
    * (the "settled frontier") propagate relaxations, so each superstep is
    * one frontier⋈edges join + a min-merge, not a full |V| relaxation.
    * Returns `(v, dist)` for every vertex reachable from `start`.
    */
  def sssp(spark: SparkSession, edges: DataFrame, start: Long, maxIter: Int = 100,
      broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).persist()
    var dist = Seq((start, 0L)).toDF("v", "dist").localCheckpoint(true)
    var frontier = dist
    var frontierCount = 1L
    var i = 0
    while (i < maxIter && frontierCount > 0) {
      // Candidate relaxations from the improved set only, broadcast only
      // under the size gate (the improved set can be O(|V|) mid-run). ONE
      // materialization per superstep: `merged` — cand feeds it exactly
      // once (no checkpoint), and frontier/dist are trivial projections of
      // the materialized merged frame (lineage stays rooted there). The
      // frontier count doubles as the termination check (it replaces the
      // isEmpty probe — same action count per superstep).
      // TWO relaxation hops per barrier (the expandTwice frontier-doubling
      // discipline applied to weighted label correction): hop-2 relaxes
      // the hop-1 PROPOSALS — proposals are walk costs so they never
      // undershoot, the full-outer min keeps only true improvements, and
      // any relaxation a non-improving proposal would have seeded was
      // already paid when its vertex last improved — so the fixpoint is
      // unchanged and the round count halves (Bellman-Ford rounds = max
      // hop count of shortest paths, the loop's entire cost at local[32]).
      def hop(fr: DataFrame, gateCount: Long): DataFrame = {
        val f2 = fr.select(col("v").as("hv"), col("nd").as("hd"))
        val fj = if (gateCount <= broadcastSeenLimit) broadcast(f2)
                 else f2.hint("merge")
        e.select(col("src").as("hsrc"), col("dst").as("hdst"), col("w").as("hw"))
          .join(fj, col("hv") === col("hsrc"))
          .select(col("hdst").as("v"), (col("hd") + col("hw")).as("nd"))
          .groupBy("v").agg(min("nd").as("nd"))
      }
      // hop-2's probe size is only known a round later — gate its
      // broadcast under the [[FusedHopFanoutAllowance]]
      val cand1 = hop(frontier.select(col("v"), col("dist").as("nd")),
        frontierCount)
      val cand = cand1
        .union(hop(cand1, frontierCount * FusedHopFanoutAllowance))
        .groupBy("v").agg(min("nd").as("nd"))
      val merged = dist.as("d").join(cand.as("c"), Seq("v"), "full_outer")
        .select(col("v"),
          least(coalesce(col("d.dist"), lit(Long.MaxValue)),
                coalesce(col("c.nd"), lit(Long.MaxValue))).as("dist"),
          (coalesce(col("c.nd"), lit(Long.MaxValue)) <
           coalesce(col("d.dist"), lit(Long.MaxValue))).as("improved"))
        .localCheckpoint(true)
      frontier = merged.filter(col("improved")).select("v", "dist")
      frontierCount = merged.filter(col("improved")).count()
      dist = merged.select("v", "dist")
      i += 2
    }
    e.unpersist()
    dist
  }

  /** BFS that carries Brandes path counts: one loop computes both the
    * level sets AND σ(v) = number of shortest start→v paths, because every
    * shortest-path predecessor of a level-l vertex is exactly a level-(l−1)
    * vertex — i.e. the whole frontier. So the frontier⋈edges join that BFS
    * already pays yields σ for free as `sum(predecessor σ)` grouped by
    * destination, and the separate forward sweep Brandes would otherwise
    * run (maxL more per-level joins + barriers) disappears. Same two-hop
    * batching and broadcast→shuffle seen-set gate as [[bfsLevels]].
    * Requires DISTINCT edges (parallel edges would double-count paths).
    * Returns `(v, level, sigma)` for every reachable vertex.
    */
  private[graft] def bfsSigma(spark: SparkSession, edges: DataFrame, start: Long,
      maxIter: Int = 50, broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    var levels = Seq((start, 0, 1L)).toDF("v", "level", "sigma")
    var frontier = levels
    var seenCount = 1L
    var frontierCount = 1L
    // Each frontier is eagerly localCheckpoint'ed, exactly like
    // [[bfsLevels]]. persist() alone is NOT enough here: a cached plan keeps
    // its full logical lineage, and because each frontier's anti-join embeds
    // the whole accumulated `levels` union, the un-truncated plan tree grows
    // geometrically with depth until AQE's plan stringification alone OOMs
    // (observed at sf0.1). The checkpoint cuts the plan at every superstep,
    // so `levels` stays a flat union of checkpointed frontiers.
    def expand(f: DataFrame, seen: DataFrame, level: Int): DataFrame = {
      val fj = if (frontierCount <= broadcastSeenLimit) broadcast(f) else f.hint("merge")
      val grown = e.join(fj, f("v") === e("src"))
        .groupBy(e("dst").as("v")).agg(sum(f("sigma")).as("sigma"))
      val pruned =
        if (seenCount <= broadcastSeenLimit)
          grown.join(broadcast(seen.select("v")), Seq("v"), "left_anti")
        else grown.join(seen.select("v").hint("merge"), Seq("v"), "left_anti")
      pruned.select(col("v"), lit(level).as("level"), col("sigma"))
        .localCheckpoint(true)
    }
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next1 = expand(frontier, levels, i + 1)
      val n1 = next1.count()
      if (n1 == 0) done = true
      else {
        seenCount += n1
        frontierCount = n1
        val seen1 = levels.union(next1)
        val next2 = expand(next1, seen1, i + 2)
        val n2 = next2.count()
        seenCount += n2
        frontierCount = n2
        val u = seen1.union(next2)
        levels = if (i % 4 >= 2) u.localCheckpoint(true) else u
        if (n2 == 0) done = true else frontier = next2
      }
      i += 2
    }
    e.unpersist()
    levels
  }

  /** Single-source Brandes dependency (the per-source slice of betweenness
    * centrality) over unweighted DISTINCT edges: σ(v) = number of shortest
    * s→v paths, accumulated level by level down the BFS DAG; δ(v) =
    * Σ_{w: succ} σ(v)/σ(w) · (1 + δ(w)), accumulated level by level back
    * up. Full betweenness sums δ over all sources — one such pass per
    * source, embarrassingly parallel at scale; a single deterministic pass
    * is the oracle-friendly unit (the DuckDB oracle unrolls both sweeps
    * over the same fixed level cap).
    *
    * Returns `(v, level, sigma, dep)` for every vertex reachable from
    * `start`, dep rounded to 6 dp (δ sums doubles — last-ulp summation
    * order must not leak into the compare).
    *
    * Scale shape: both sweeps are per-level joins keyed on vertex id —
    * each superstep touches one BFS level, never the whole graph; σ/δ
    * frames stay distributed. maxLevel is a scalar planner statistic.
    */
  def brandesDependency(spark: SparkSession, edges: DataFrame, start: Long,
      maxIter: Int = 50): DataFrame = {
    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    // Levels AND path counts from ONE BFS loop ([[bfsSigma]]): σ falls out
    // of the frontier⋈edges join BFS already pays, so the classic separate
    // forward sweep (maxL more per-level joins and their barriers) is gone.
    val sigAll = bfsSigma(spark, ed, start, maxIter).localCheckpoint(true)
    brandesBackward(spark, ed, sigAll)
  }

  /** Single-source backward sweep over a precomputed `(v, level, sigma)`
    * frame — see [[multiBrandesBackward]] for why this is split out. */
  private[graft] def brandesBackward(spark: SparkSession, ed: DataFrame,
      sigAll: DataFrame): DataFrame = {
    import spark.implicits._
    val maxL = sigAll.agg(max("level")).collect()(0).getInt(0)
    // backward sweep: dependency accumulation up the DAG. The σ context is
    // joined ONCE up front — DAG edges (wlevel == srclevel + 1) annotated
    // with both endpoint σs and the source level — so each level of the
    // sweep is a single join against the previous level's δ instead of
    // re-joining levels/edges/σ/σ every superstep (4 joins → 1 per level;
    // the annotated edge set is exactly the Brandes DAG, nothing larger).
    val dagEdges = ed
      .join(sigAll.select(col("v").as("xv"), col("level").as("xlevel"),
        col("sigma").as("xsigma")), col("src") === col("xv"))
      .join(sigAll.select(col("v").as("wv"), col("level").as("wlevel"),
        col("sigma").as("wsigma")), col("dst") === col("wv") &&
        col("wlevel") === col("xlevel") + 1)
      .select(col("src"), col("dst"), col("xlevel"), col("xsigma"), col("wsigma"))
      .localCheckpoint(true)
    var delPrev = Seq.empty[(Long, Double)].toDF("dv", "delta") // level maxL has no successors
    var dels = List.empty[DataFrame]
    for (l <- (maxL - 1) to 0 by -1) {
      val cur0 = dagEdges.filter(col("xlevel") === l)
        .join(delPrev, col("dst") === col("dv"), "left")
        .groupBy(col("src").as("v"))
        .agg(sum(col("xsigma").cast("double") / col("wsigma").cast("double") *
          (lit(1.0) + coalesce(col("delta"), lit(0.0)))).as("delta"))
        .select(col("v").as("dv"), col("delta"))
      // Same every-3rd-barrier policy as the forward sweep; cur is consumed
      // twice (next level + final union) so the lazy window stays ≤3 deep.
      val cur = if (l % 3 == 0 || l == 0) cur0.localCheckpoint(true) else cur0
      dels ::= cur
      delPrev = cur
    }
    val delAll = dels match {
      case Nil => delPrev
      case ds  => ds.reduce(_ union _)
    }
    sigAll.join(delAll, col("v") === col("dv"), "left")
      .select(col("v"), col("level"), col("sigma"),
        round(coalesce(col("delta"), lit(0.0)), 4).as("dep"))
  }

  /** Strongly connected components of a DIRECTED graph — the coloring
    * (forward-backward) BSP algorithm, the standard distributed SCC
    * formulation (Orzan; FW-BW-Trim family):
    *
    * per round over the remaining subgraph:
    *  0. TRIM to a fixpoint: vertices with no in-edge or no out-edge in
    *     the remaining subgraph are singleton SCCs and peel off before
    *     any flood — two semi joins per peel, so chain/tree regions never
    *     cost a color flood (the r6 "trim pre-pass" task);
    *  1. flood the MAX vertex id forward to a fixpoint ("colors": color(v)
    *     = max id among v's ancestors ∪ v) — improvement-frontier
    *     propagation, one frontier⋈edges join + max-merge per superstep;
    *  2. roots = vertices whose color is themselves; every root's SCC is
    *     exactly the set it can reach BACKWARD through vertices of its own
    *     color (multi-source backward BFS batched over ALL roots at once,
    *     riding one loop the way [[multiSourceBfs]] batches seeds);
    *  3. assigned vertices leave the graph; unresolved ones (forward-only
    *     vertices colored by a larger non-mutual ancestor) go to the next
    *     round.
    *
    * Adversarial chains need O(chain depth) rounds, so the round cap
    * throws rather than returning a partial decomposition (same loud-fail
    * discipline as [[dagLayers]]); GraphSpec exercises a 2-round graph.
    * All joins obey the frontier/seen-set broadcast gates of the BFS
    * family. Returns `(v, scc)` with scc = MAX vertex id of the component.
    */
  def stronglyConnectedComponents(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 5, maxIter: Int = 100,
      broadcastSeenLimit: Long = BroadcastSeenLimit): DataFrame = {
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    var rem = e0.select(col("src").as("v")).union(e0.select(col("dst").as("v")))
      .distinct().localCheckpoint(true)
    var e = e0
    var out = List.empty[DataFrame]
    var round = 0
    var remCount = rem.count()
    def gated(f: DataFrame, n: Long): DataFrame =
      if (n <= broadcastSeenLimit) broadcast(f) else f.hint("merge")
    while (remCount > 0 && round < maxRounds) {
      // 0. trim pre-pass (the "Trim" of FW-BW-Trim): a vertex with no
      // in-edge or no out-edge in the remaining subgraph cannot lie on a
      // cycle, so it is its own singleton SCC. Peel to a fixpoint before
      // the flood — each peel is two distincts + two semi joins, far
      // cheaper than a flood superstep, and it removes the chains and
      // dangling trees the color flood would otherwise burn a full
      // O(depth) round on. Bounded by maxIter; a stalled trim just falls
      // through to the flood (trim is an optimization, not a phase the
      // algorithm needs for correctness).
      var trimming = true
      var t = 0
      while (trimming && remCount > 0 && t < maxIter) {
        val haveOut = e.select(col("src").as("v")).distinct()
        val haveIn = e.select(col("dst").as("v")).distinct()
        val core = rem.join(haveOut, Seq("v"), "left_semi")
          .join(haveIn, Seq("v"), "left_semi").localCheckpoint(true)
        val coreCount = core.count()
        if (coreCount == remCount) trimming = false
        else {
          val peeled = rem.join(gated(core, coreCount), Seq("v"), "left_anti")
            .select(col("v"), col("v").as("scc")).localCheckpoint(true)
          out ::= peeled
          rem = core
          remCount = coreCount
          if (remCount > 0) {
            val cv1 = core.select(col("v").as("cv1"))
            val cv2 = core.select(col("v").as("cv2"))
            e = e.join(gated(cv1, coreCount), col("src") === col("cv1"), "left_semi")
              .join(gated(cv2, coreCount), col("dst") === col("cv2"), "left_semi")
              .localCheckpoint(true)
          }
        }
        t += 1
      }
      if (remCount == 0) { round += 1 }
      else {
      // 1. forward max-color flood (improvement frontiers only). One hop
      // per materialization, deliberately: a two-hop overlay batching
      // (the dagLayers shape) was tried in r7 and MEASURED SLOWER here —
      // the post-trim colors table is small enough that the full
      // left-join update is cheaper than the extra overlay join +
      // anti-merge the batching pays.
      var colors = rem.select(col("v"), col("v").as("color")).localCheckpoint(true)
      var frontier = colors
      var fCount = remCount
      var i = 0
      while (fCount > 0 && i < maxIter) {
        val cand = e.join(gated(frontier, fCount), col("v") === col("src"))
          .groupBy(col("dst").as("w")).agg(max("color").as("nc"))
        val joined = colors.join(cand, col("v") === col("w"), "left")
          .select(col("v"),
            greatest(col("color"), coalesce(col("nc"), col("color"))).as("c2"),
            (coalesce(col("nc"), col("color")) > col("color")).as("improved"))
          .localCheckpoint(true)
        frontier = joined.filter(col("improved"))
          .select(col("v"), col("c2").as("color"))
        fCount = joined.filter(col("improved")).count()
        colors = joined.select(col("v"), col("c2").as("color"))
        i += 1
      }
      if (fCount > 0) throw new IllegalStateException(
        s"SCC color flood did not converge in $maxIter supersteps")
      colors = colors.localCheckpoint(true)
      // 2. backward reach from all roots, restricted to same-color edges
      val er = e
        .join(colors.select(col("v").as("sv"), col("color").as("scol")),
          col("src") === col("sv"))
        .join(colors.select(col("v").as("dv"), col("color").as("dcol")),
          col("dst") === col("dv"))
        .filter(col("scol") === col("dcol"))
        .select(col("dst").as("efrom"), col("src").as("eto"), col("scol").as("ecolor"))
        .localCheckpoint(true)
      var assigned = colors.filter(col("v") === col("color"))
        .select(col("v"), col("color").as("scc")).localCheckpoint(true)
      var assignedCount = assigned.count()
      var bf = assigned
      var bCount = assignedCount
      i = 0
      while (bCount > 0 && i < maxIter) {
        val grown = er.join(gated(bf, bCount),
            col("v") === col("efrom") && col("scc") === col("ecolor"))
          .select(col("eto").as("v"), col("scc")).distinct()
        val fresh = grown.join(gated(assigned.select("v"), assignedCount),
            Seq("v"), "left_anti")
          .localCheckpoint(true)
        bCount = fresh.count()
        if (bCount > 0) {
          assigned = assigned.union(fresh).localCheckpoint(true)
          assignedCount += bCount
        }
        bf = fresh
        i += 1
      }
      out ::= assigned
      // 3. shrink the remaining subgraph
      rem = rem.join(gated(assigned.select("v"), assignedCount), Seq("v"), "left_anti")
        .localCheckpoint(true)
      remCount = rem.count()
      if (remCount > 0) {
        val av = assigned.select(col("v").as("av"))
        e = e.join(gated(av, assignedCount), col("src") === col("av"), "left_anti")
          .join(gated(assigned.select(col("v").as("av2")), assignedCount),
            col("dst") === col("av2"), "left_anti")
          .localCheckpoint(true)
      }
      round += 1
      }
    }
    if (remCount > 0) throw new IllegalStateException(
      s"SCC did not resolve in $maxRounds coloring rounds - " +
        s"$remCount vertices left; raise maxRounds for chain-heavy graphs")
    out.reduce(_ union _).select(col("v"), col("scc"))
  }

  /** Edge count up to which [[connectedComponents]] solves on the driver:
    * 1M (long, long) edges collected as primitive pairs ≈ 50–100 MB of
    * driver heap with tuple/array overhead — comparable to a broadcast
    * relation. The near-dup pair graphs this serves (verified LSH
    * collisions) are orders of magnitude smaller than their corpus, so at
    * 100 TB the gate usually still picks the driver solve; a genuinely
    * huge edge set falls through to the BSP loop. */
  private[graft] val DriverSolveEdgeLimit = 1L * 1000 * 1000

  /** Connected components of an edge list that must already contain BOTH
    * directions of every edge. Returns `(v: long, comp: long)` where
    * comp = min vertex id in the component.
    *
    * Size-gated like the BFS seen-set broadcast: a small edge set (most
    * post-filter similarity graphs) is collected and solved with one
    * union-find pass — a distributed min-label loop costs 2–4 supersteps
    * of join+shuffle+materialize FIXED overhead that dwarfs the work.
    * Past `DriverSolveEdgeLimit` the BSP min-label propagation runs,
    * converging in O(diameter) supersteps.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    val e = edges.select(col("src").cast("long").as("esrc"),
      col("dst").cast("long").as("edst")).persist()
    // The count doubles as the size gate and materializes the persist for
    // whichever path runs.
    val edgeCount = e.count()
    if (edgeCount <= driverSolveLimit) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // collect PRIMITIVE pairs via the RDD, not Rows (a GenericRow costs
      // ~10x the two longs it carries — the gate's size math assumes pairs)
      val arr = e.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      val verts = scala.collection.mutable.HashSet.empty[Long]
      arr.foreach { case (a, b) =>
        verts += a; verts += b
        val (ra, rb) = (find(a), find(b))
        // union by min root keeps comp = min vertex id deterministically
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val out = verts.toArray.sorted.map(v => (v, find(v))).toSeq
      e.unpersist()
      import spark.implicits._
      return out.toDF("v", "comp")
    }
    // localCheckpoint up front also severs lineage provenance so the
    // label⋈edge joins below aren't flagged as ambiguous self-joins.
    var labels = e.select(col("esrc").as("v")).union(e.select(col("edst").as("v")))
      .distinct().withColumn("comp", col("v")).localCheckpoint(true)
    var i = 0
    var changed = 1L
    while (i < maxIter && changed > 0) {
      val nbrMin = labels.as("l").join(e.as("e"), col("l.v") === col("e.esrc"))
        .groupBy(col("e.edst").as("nv"))
        .agg(min(col("l.comp")).as("nbr_comp"))
      // One materialization per superstep: the changed-count and the next
      // label set are both cheap projections of the checkpointed frame.
      val updated = labels.join(nbrMin, labels("v") === col("nv"), "left")
        .select(labels("v"), col("comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp2"))
        .localCheckpoint(true)
      changed = updated.filter(col("comp2") < col("comp")).count()
      labels = updated.select(col("v"), col("comp2").as("comp"))
      i += 1
    }
    e.unpersist()
    labels
  }

  /** Round cap shared by [[maximalIndependentSet]]'s two paths and the
    * q_graph_mis oracle's fixed SQL unroll (rounds past convergence are
    * empty no-ops on both sides; non-convergence within the cap is a loud
    * failure, never a truncated result). */
  private[graft] val MisRoundCap = 32

  /** Loud domain gate for every LCG-priority consumer: p(v) =
    * (v·1103515245 + 12345) mod 2³¹ is injective ONLY on 0 ≤ v < 2³¹
    * (its full period). Outside that domain two ADJACENT vertices can
    * tie, and the greedy-by-priority operators diverge silently —
    * [[maximalIndependentSet]] would at least fail its convergence
    * require, but [[jonesPlassmannColoring]] would emit an improper
    * coloring (a tied pair lands in neither hp direction, both become
    * ready in round 1, both can take the same mex color) and the
    * incremental cone replays' sortBy(pri) order becomes ambiguous.
    * `und` is the symmetrized edge frame, so `src` covers every vertex;
    * the one cheap agg rides the persist the caller already paid for. */
  private def requireLcgPriorityDomain(und: DataFrame, op: String): Unit = {
    val r = und.agg(min(col("src")).as("lo"), max(col("src")).as("hi")).collect()(0)
    if (!r.isNullAt(0))
      require(r.getLong(0) >= 0L && r.getLong(1) < 2147483648L,
        s"$op: vertex ids span [${r.getLong(0)}, ${r.getLong(1)}], outside " +
          "the LCG priority's injective domain [0, 2^31) - adjacent " +
          "priorities could tie and greedy-by-priority order is undefined")
  }

  /** Deterministic MAXIMAL INDEPENDENT SET — Luby-style min-priority
    * rounds under the fixed LCG priority p(v) = (v·1103515245 + 12345)
    * mod 2³¹ (odd multiplier × power-of-two modulus ⇒ injective for
    * v < 2³¹, so priority ties cannot occur): each round selects every
    * ACTIVE vertex whose priority is strictly below every active
    * neighbor's, adds it to the set, and deactivates its closed
    * neighborhood. With a fixed injective priority the parallel fixpoint
    * EQUALS the sequential greedy MIS in priority order, and the
    * selection round is the vertex's depth in the greedy dependency
    * chain — fully deterministic, so the oracle replays the identical
    * rounds in SQL. Input edges may be directed/duplicated; self-loops
    * are dropped (a self-looped vertex is its own neighbor and could
    * never be selected); isolated vertices are out of scope (an edge
    * list cannot carry them). Returns `(v, round)` for members, 1-based.
    *
    * Size-gated like [[connectedComponents]]: ≤`driverSolveLimit` edges
    * run an in-memory simulation of the SAME rounds; past the gate the
    * BSP loop runs — per round one active-pruned neighbor-min join, one
    * selection filter, one closed-neighborhood anti-join, all keyed on
    * the vertex. Expected O(log n) rounds on bounded-degree graphs
    * (Luby); `maxRounds` bounds both paths loudly, matching the oracle's
    * fixed unroll. q_graph_mis benches the gate path, q_graph_mis_bsp
    * forces this loop (the q_graph_cc_bsp discipline).
    */
  def maximalIndependentSet(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = MisRoundCap,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    val e0 = edges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long"), col("dst").cast("long"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val edgeCount = und.count() // gate + materializes the persist
    requireLcgPriorityDomain(und, "maximalIndependentSet")
    def pri(v: Long): Long = (v * 1103515245L + 12345L) % 2147483648L
    if (edgeCount <= driverSolveLimit) {
      val arr = und.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      und.unpersist()
      val adj = arr.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      val active = scala.collection.mutable.HashSet.empty[Long]
      adj.keysIterator.foreach(active += _)
      val out = Seq.newBuilder[(Long, Int)]
      var r = 0
      while (active.nonEmpty && r < maxRounds) {
        r += 1
        val sel = active.iterator.filter { v =>
          val pv = pri(v)
          adj(v).forall(u => !active.contains(u) || pri(u) > pv)
        }.toArray
        out ++= sel.map(v => (v, r))
        sel.foreach { v => active -= v; adj(v).foreach(active -= _) }
      }
      require(active.isEmpty, s"MIS did not converge within $maxRounds rounds")
      return out.result().toDF("v", "round")
    }
    val priCol = (c: org.apache.spark.sql.Column) =>
      (c * 1103515245L + 12345L) % 2147483648L
    var active = und.select(col("src").as("v")).distinct()
      .withColumn("p", priCol(col("v"))).localCheckpoint(true)
    var activeCount = active.count()
    var result = Seq.empty[(Long, Int)].toDF("v", "round")
    var r = 0
    while (activeCount > 0 && r < maxRounds) {
      r += 1
      // min priority among ACTIVE neighbors of ACTIVE vertices
      val nbrMin = und
        .join(active.select(col("v").as("av")), col("src") === col("av"), "left_semi")
        .join(active.select(col("v").as("dv"), col("p").as("dp")), col("dst") === col("dv"))
        .groupBy(col("src").as("mv")).agg(min("dp").as("minp"))
      val sel = active.join(nbrMin, col("v") === col("mv"), "left")
        .filter(col("p") < coalesce(col("minp"), lit(Long.MaxValue)))
        .select("v").localCheckpoint(true)
      result = result.union(sel.select(col("v"), lit(r).as("round")))
      val removed = sel
        .union(und.join(sel.select(col("v").as("sv")), col("src") === col("sv"), "left_semi")
          .select(col("dst").as("v")))
        .distinct()
      active = active.join(removed, Seq("v"), "left_anti").localCheckpoint(true)
      activeCount = active.count()
    }
    und.unpersist()
    require(activeCount == 0, s"MIS did not converge within $maxRounds rounds")
    result
  }

  /** INCREMENTAL MIS maintenance over INSERT-only edge deltas — the
    * symmetry-breaking member of the incremental family: given the
    * previous snapshot's MIS (the [[maximalIndependentSet]] contract) and
    * the edges inserted since, returns the new graph's MIS WITHOUT
    * re-running the rounds over the old graph.
    *
    * Theory: under the fixed injective priority, v's membership is a
    * function of its higher-priority neighbors' memberships ONLY (greedy
    * recursion along the priority order). An inserted edge (a, b) changes
    * exactly the HIGHER-p endpoint's input; any consequence propagates
    * strictly DOWNSTREAM along priority-decreasing edges. The maintenance
    * step therefore (1) seeds the changed-input vertices (plus vertices
    * new to the snapshot), (2) expands their downstream DEPENDENCY CONE
    * over the new graph's hp-DAG with a BSP frontier loop (per-round work
    * ∝ frontier, not graph), (3) gathers the cone's hp-adjacency plus the
    * OLD memberships on its boundary — cone-sized, require()d under
    * `coneGatherLimit` — and (4) replays the greedy decisions inside the
    * cone in one driver pass. Memberships outside the cone are reused
    * VERBATIM. The cone is the CONSERVATIVE closure (potential, not
    * actual, change): a delta among low-priority vertices has a shallow
    * cone, while a highest-priority delta degenerates toward a full
    * replay — the same honest contract as warm-start PageRank: the bound
    * is structural, and the caller's delta locality determines the win.
    * DELETIONS are out of scope loudly (removing an edge can flip an
    * UPSTREAM exclusion, which cannot be decided from (state, delta)).
    *
    * `maxConeFraction` lets a caller require the scoping to be REAL
    * (cone strictly smaller than the graph) — fixture drift that
    * degrades maintenance to a full replay then fails instead of
    * silently passing. Returns `(v)` — members of the new MIS (round
    * numbers are not maintained: an inserted dependency can delay a
    * vertex's round without changing any membership).
    */
  /** The gathered downstream-dependency-cone subproblem shared by the
    * incremental MIS and coloring maintainers: cone vertex frame (for the
    * state splice), cone vertices + their FULL hp-adjacency in memory,
    * and the boundary frame (hp-neighbors outside the cone, whose OLD
    * state is valid on the new graph by the cone invariant). Empty cone
    * ⇒ coneVerts empty and the caller returns the previous state verbatim. */
  private case class HpCone(coneDf: DataFrame, coneVerts: Array[Long],
      hpAdj: Map[Long, Array[Long]], boundaryDf: DataFrame)

  /** Driver-gather pair budget for the dependency-cone subproblem
    * (r11 VERDICT weak mark): the cone-VERTEX gate alone does not bound
    * what reaches the driver — the gather collects the cone's full
    * hp-adjacency, so a single high-degree hub inside a tiny cone can
    * defeat a vertex-count bound by orders of magnitude. 2M pairs
    * ≈ 32 MB of longs, comfortably driver-sized; past it the maintainers
    * fall back to the full distributed operator (total, never a
    * require-failure). */
  private[graft] val ConeGatherPairLimit = 2000000L

  /** Build the conservative change cone of an insert-only delta under the
    * fixed LCG priority — see [[incrementalMaximalIndependentSet]] for
    * the theory and the honesty contract of `maxConeFraction`.
    *
    * Returns None — "this delta is not profitably cone-scoped, run the
    * full operator" — when the cone outgrows `coneGatherLimit` vertices,
    * fails to close within `maxRounds` waves, or its gathered
    * hp-adjacency exceeds `coneGatherPairLimit` PAIRS (the skew gate: a
    * hub inside the cone contributes its whole degree to the gather even
    * when cone vertices stay tiny). The ONLY remaining require() is
    * `maxConeFraction` — an explicit fixture-honesty opt-in asserting the
    * scoping stays real, never hit with the 1.0 default. */
  private def hpDependencyCone(spark: SparkSession, newEdges: DataFrame,
      prevEdges: DataFrame, inserted: DataFrame, maxRounds: Int,
      coneGatherLimit: Long, coneGatherPairLimit: Long,
      maxConeFraction: Double): Option[HpCone] = {
    import spark.implicits._
    val priCol = (c: org.apache.spark.sql.Column) =>
      (c * 1103515245L + 12345L) % 2147483648L
    val e0 = newEdges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long"), col("dst").cast("long"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val totalV = und.select("src").distinct().count()
    requireLcgPriorityDomain(und, "hpDependencyCone")
    // dependency edges on the NEW graph: src's decision waits on dst
    val hpEdges = und.filter(priCol(col("dst")) < priCol(col("src")))
      .localCheckpoint(true)
    // seeds: the higher-priority-VALUE (= later-deciding) endpoint of
    // each inserted edge — the only endpoint whose input set changed —
    // plus any vertex absent from the previous snapshot
    val insSeeds = inserted.filter(col("src") =!= col("dst"))
      .select(when(priCol(col("src")) > priCol(col("dst")), col("src"))
        .otherwise(col("dst")).cast("long").as("v"))
    // SAME normalization as the full operators (self-loops dropped): a
    // vertex that existed only via a self-loop was OUTSIDE the previous
    // universe and must be treated as new, not as unaffected
    val prevVerts = prevEdges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long").as("v"))
      .union(prevEdges.filter(col("src") =!= col("dst"))
        .select(col("dst").cast("long").as("v"))).distinct()
    val newVerts = und.select(col("src").as("v")).distinct()
      .join(prevVerts, Seq("v"), "left_anti")
    var cone = insSeeds.unionByName(newVerts).distinct().localCheckpoint(true)
    var frontier = cone
    var coneCount = cone.count()
    // the limit must bound the SEED set too: a huge delta whose cone
    // never grows past its seeds would otherwise reach the driver gather
    // with no size check at all
    if (coneCount > coneGatherLimit) {
      trace(s"hpDependencyCone: $coneCount seeds exceed the " +
        s"$coneGatherLimit-vertex gather limit - falling back to the full operator")
      return None
    }
    var grew = coneCount > 0
    var r = 0
    while (grew && r < maxRounds) {
      r += 1
      val next = hpEdges
        .join(frontier.select(col("v").as("fv")), col("dst") === col("fv"), "left_semi")
        .select(col("src").as("v")).distinct()
        .join(cone, Seq("v"), "left_anti").localCheckpoint(true)
      val n = next.count()
      if (n == 0) grew = false
      else {
        cone = cone.union(next).localCheckpoint(true)
        coneCount += n
        frontier = next
        if (coneCount > coneGatherLimit) {
          trace(s"hpDependencyCone: cone ($coneCount vertices) exceeded the " +
            s"$coneGatherLimit-vertex gather limit - falling back to the full operator")
          return None
        }
      }
    }
    if (grew) {
      trace(s"hpDependencyCone: cone did not close within $maxRounds waves" +
        " - falling back to the full operator")
      return None
    }
    require(coneCount <= totalV * maxConeFraction,
      s"cone covers $coneCount of $totalV vertices - the delta no longer" +
        " demonstrates scoped maintenance")
    if (coneCount == 0)
      return Some(HpCone(cone, Array.empty, Map.empty, cone.limit(0)))
    // gather the cone subproblem: its full hp-adjacency + the boundary
    // vertex set. Cone VERTICES are bounded above; the PAIR gate bounds
    // what actually reaches the driver (cone x degree — a single hub
    // inside the cone can carry its whole degree here).
    // ONE gather job does gate + gather (r12 VERDICT #6: the separate
    // checkpoint + count pair gate showed up as the maintainer's cost
    // band): limit(pairLimit+1).collect() stops streaming rows to the
    // driver the moment the budget is exceeded — the driver never holds
    // more than pairLimit+1 pairs, exactly the bound the old count gate
    // enforced, without materializing coneHp twice. The boundary set is
    // then pure driver arithmetic on the already-gathered pairs (its old
    // spelling was a distributed distinct + anti-join over coneHp).
    val coneHp = hpEdges
      .join(cone.select(col("v").as("cv")), col("src") === col("cv"), "left_semi")
    val gathered = coneHp.limit(coneGatherPairLimit.toInt + 1).collect()
    if (gathered.length > coneGatherPairLimit) {
      trace(s"hpDependencyCone: cone hp-adjacency (>$coneGatherPairLimit " +
        s"pairs over $coneCount vertices) exceeded the gather limit - " +
        "falling back to the full operator")
      return None
    }
    val pairs = gathered.map(x => (x.getLong(0), x.getLong(1)))
    val coneVerts = cone.rdd.map(_.getLong(0)).collect()
    val coneSet = new java.util.HashSet[Long](coneVerts.length * 2)
    coneVerts.foreach(coneSet.add)
    val boundaryDf = pairs.iterator.map(_._2)
      .filter(d => !coneSet.contains(d)).toSeq.distinct.toDF("v")
    val hpAdj = pairs.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    Some(HpCone(cone, coneVerts, hpAdj, boundaryDf))
  }

  def incrementalMaximalIndependentSet(spark: SparkSession, newEdges: DataFrame,
      prevEdges: DataFrame, prevMis: DataFrame, inserted: DataFrame,
      // cone waves advance one hp-DAG hop each, so their bound is the
      // DAG-depth cap (48), NOT the O(log n) MIS round cap — a deep
      // high-priority delta must not fail on input the full operator
      // handles fine
      maxRounds: Int = ColoringRoundCap, coneGatherLimit: Long = 200000L,
      coneGatherPairLimit: Long = ConeGatherPairLimit,
      maxConeFraction: Double = 1.0): DataFrame = {
    import spark.implicits._
    def pri(v: Long): Long = (v * 1103515245L + 12345L) % 2147483648L
    val c = hpDependencyCone(spark, newEdges, prevEdges, inserted,
      maxRounds, coneGatherLimit, coneGatherPairLimit, maxConeFraction) match {
      // past a gather gate the maintainer is TOTAL, not require-failing:
      // the full operator on the new snapshot is always correct (its own
      // size gate picks driver vs distributed), and round numbers are
      // projected away per this maintainer's contract
      case None => return maximalIndependentSet(spark, newEdges).select("v")
      case Some(cone) => cone
    }
    if (c.coneVerts.isEmpty) return prevMis.select(col("v").cast("long"))
    // old memberships on the boundary remain valid on the new graph
    val member = scala.collection.mutable.HashSet.empty[Long]
    c.boundaryDf.join(prevMis.select(col("v")), Seq("v"), "left_semi")
      .rdd.map(_.getLong(0)).collect().foreach(member += _)
    c.coneVerts.sortBy(pri).foreach { v =>
      // in-cone hp-neighbors are already decided (processed in priority
      // order); boundary hp-neighbors carry their old membership
      if (!c.hpAdj.getOrElse(v, Array.empty[Long]).exists(member)) member += v
    }
    val coneMembers = c.coneVerts.filter(member).sorted
    prevMis.select(col("v").cast("long"))
      .join(c.coneDf, Seq("v"), "left_anti")
      .unionByName(coneMembers.toSeq.toDF("v"))
  }

  /** INCREMENTAL Jones–Plassmann maintenance — the coloring twin of
    * [[incrementalMaximalIndependentSet]], over the SAME dependency cone:
    * colors are a function of higher-priority neighbors' colors only, so
    * outside the cone the old colors are valid verbatim and inside it the
    * greedy mex replays in one driver pass seeded by the boundary colors.
    * Returns `(v, color)` — rounds are not maintained (an inserted
    * dependency can delay a round without changing any color). */
  def incrementalColoring(spark: SparkSession, newEdges: DataFrame,
      prevEdges: DataFrame, prevColors: DataFrame, inserted: DataFrame,
      maxRounds: Int = ColoringRoundCap, coneGatherLimit: Long = 200000L,
      coneGatherPairLimit: Long = ConeGatherPairLimit,
      maxConeFraction: Double = 1.0): DataFrame = {
    import spark.implicits._
    def pri(v: Long): Long = (v * 1103515245L + 12345L) % 2147483648L
    val prevVC = prevColors.select(col("v").cast("long"), col("color").cast("int"))
    val c = hpDependencyCone(spark, newEdges, prevEdges, inserted,
      maxRounds, coneGatherLimit, coneGatherPairLimit, maxConeFraction) match {
      // total fallback past a gather gate — see incrementalMaximalIndependentSet
      case None => return jonesPlassmannColoring(spark, newEdges)
        .select(col("v"), col("color"))
      case Some(cone) => cone
    }
    if (c.coneVerts.isEmpty) return prevVC
    val colorOf = scala.collection.mutable.LongMap.empty[Int]
    c.boundaryDf.join(prevVC, Seq("v"))
      .rdd.map(x => (x.getLong(0), x.getInt(1))).collect()
      .foreach { case (v, col) => colorOf(v) = col }
    c.coneVerts.sortBy(pri).foreach { v =>
      val used = c.hpAdj.getOrElse(v, Array.empty[Long]).iterator.flatMap { u =>
        // every hp-neighbor is decided: in-cone ones earlier in this
        // loop, boundary ones by their old color — a miss is a bug
        Some(colorOf.getOrElse(u,
          throw new IllegalStateException(s"undecided hp-neighbor $u of $v")))
      }.toSet
      colorOf(v) = Iterator.from(0).find(!used(_)).get
    }
    val coneColored = c.coneVerts.sorted.map(v => (v, colorOf(v))).toSeq
    prevVC.join(c.coneDf, Seq("v"), "left_anti")
      .unionByName(coneColored.toDF("v", "color"))
  }

  /** New-snapshot vertex universe (symmetrized, self-loops dropped) —
    * the delete-aware wrappers restrict carried-over state to it. */
  private def edgeUniverse(edges: DataFrame): DataFrame = {
    val e0 = edges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long"), col("dst").cast("long"))
    e0.select(col("src").as("v"))
      .union(e0.select(col("dst").as("v"))).distinct()
  }

  private def diffUnion(inserted: DataFrame, deleted: DataFrame): DataFrame =
    inserted.select(col("src").cast("long"), col("dst").cast("long"))
      .unionByName(deleted.select(col("src").cast("long"), col("dst").cast("long")))

  /** DELETION-aware twins of the symmetry-breaking maintainers. Decisions
    * are functions of HIGHER-priority neighbors only, and a deleted
    * dependency changes exactly the same vertex an inserted one does —
    * the later-deciding endpoint — so the SAME conservative hp-cone
    * serves both diff sides: seed it with inserted ∪ deleted and the
    * cone expansion + greedy replay already run on the NEW graph (a
    * deleted edge is simply absent from the replay's dependencies). The
    * one delete-specific obligation is the UNIVERSE: a vertex whose every
    * edge was deleted vanishes from the edge-defined output, so the
    * carried-over old state is restricted to the new snapshot's vertex
    * set (cone output is already new-graph-scoped). */
  def incrementalMaximalIndependentSetDelete(spark: SparkSession,
      newEdges: DataFrame, prevEdges: DataFrame, prevMis: DataFrame,
      inserted: DataFrame, deleted: DataFrame,
      maxRounds: Int = ColoringRoundCap, coneGatherLimit: Long = 200000L,
      coneGatherPairLimit: Long = ConeGatherPairLimit,
      maxConeFraction: Double = 1.0): DataFrame =
    incrementalMaximalIndependentSet(spark, newEdges, prevEdges, prevMis,
      diffUnion(inserted, deleted), maxRounds, coneGatherLimit,
      coneGatherPairLimit, maxConeFraction)
      .join(edgeUniverse(newEdges), Seq("v"), "left_semi")

  /** See [[incrementalMaximalIndependentSetDelete]] — the coloring twin. */
  def incrementalColoringDelete(spark: SparkSession,
      newEdges: DataFrame, prevEdges: DataFrame, prevColors: DataFrame,
      inserted: DataFrame, deleted: DataFrame,
      maxRounds: Int = ColoringRoundCap, coneGatherLimit: Long = 200000L,
      coneGatherPairLimit: Long = ConeGatherPairLimit,
      maxConeFraction: Double = 1.0): DataFrame =
    incrementalColoring(spark, newEdges, prevEdges, prevColors,
      diffUnion(inserted, deleted), maxRounds, coneGatherLimit,
      coneGatherPairLimit, maxConeFraction)
      .join(edgeUniverse(newEdges), Seq("v"), "left_semi")

  /** Round cap shared by [[jonesPlassmannColoring]]'s two paths and the
    * q_graph_coloring oracle's fixed unroll (same contract as
    * [[MisRoundCap]]: no-op rounds past convergence, loud failure past
    * the cap). JP depth = the longest priority-decreasing path, much
    * deeper than the MIS removal depth — measured 18/23 rounds at
    * sf0.01/sf0.1 on the ring fixture (the ~+5-per-10x growth of a max
    * over n d-step chains), capped at 48 for sf1 headroom. */
  private[graft] val ColoringRoundCap = 48

  /** Degree-agnostic distributed MEX aggregate over an int column
    * `ncolor`: sort the DISTINCT neighbor colors, then fold — the first
    * value ≠ the running counter is the first gap, so the counter lands
    * on mex(S). Replaces the r9 single-word bitmask (`bit_or` of
    * `1 << color`), whose 63-color ceiling made the whole coloring
    * family REFUSE any graph with a ≥63-degree hub — i.e. every
    * power-law graph at the engine's target scale (r9 VERDICT #1).
    * Scale shape is unchanged from the bitmask: ONE shuffle
    * (`collect_set` keeps partial aggregation, its map-side state is the
    * distinct-color set — bounded by the neighborhood's chromatic
    * spread, NOT by degree: a 10^6-degree hub whose neighbors use 40
    * colors carries a 40-int set), and the fold is a scalar expression
    * over the grouped row. Measured vs the bitmask on the sf0.1 ring
    * fixture (ledger, PLANS.md r10): q_graph_coloring_bsp and _spec
    * within run-to-run noise of the bitmask build, so the ceiling lift
    * costs nothing. A CHUNKED multi-word bitmask (ceil(Δ/63) `bit_or`
    * words) was the rejected alternative: it needs a second per-word
    * shuffle or a map-typed state, and its only edge over the sorted
    * set — O(colors/63) vs O(colors) state — pays off exactly never,
    * because both are bounded by the same chromatic spread. */
  private[graft] val mexAggExpr: org.apache.spark.sql.Column =
    expr("aggregate(sort_array(collect_set(ncolor)), 0, " +
      "(m, c) -> CASE WHEN c = m THEN m + 1 ELSE m END)")

  /** JONES–PLASSMANN greedy graph coloring — the second classic
    * symmetry-breaking BSP primitive next to [[maximalIndependentSet]],
    * under the SAME fixed injective LCG priority: color(v) = mex of the
    * colors of v's HIGHER-priority neighbors, which is recursively
    * well-defined along the priority order and EQUALS the sequential
    * greedy coloring in that order; a vertex colors itself in the round
    * after its last higher-priority neighbor does, so round(v) is the
    * vertex's depth in the priority-decreasing dependency DAG. Everything
    * — membership, color, round — is deterministic, so the oracle replays
    * the identical rounds. Self-loops dropped (uncolorable otherwise);
    * returns `(v, color, round)`, colors 0-based, rounds 1-based.
    *
    * Scale shape of the BSP path: the hp-edge table (edges into
    * higher-priority... rather FROM lower: src→dst with p(dst) < p(src))
    * is computed ONCE as a static filter — priorities are pure arithmetic
    * on the id, so "who waits for whom" never needs a join. Each round is
    * then one blocked-set semi-join, one color-lookup join for the ready
    * frontier, and one mex aggregation over candidate colors (the {0} ∪
    * {c+1} trick: the mex of a set S is the min of those candidates not
    * in S — no per-vertex loop, no UDF). JP's cost profile is a LONG THIN
    * TAIL — the ready-set sizes decay geometrically, so the last ~half of
    * the rounds each pay a full barrier to color <2% of the vertices
    * (measured: rounds 12–23 of 23 color 8% at sf0.1). The loop therefore
    * TAIL-FINISHES: once ≤`tailSolveVertices` remain uncolored, the
    * residual subproblem (remaining hp-edges + the already-assigned
    * colors on their boundary) is gathered and the SAME rounds complete
    * in one driver pass, round numbering continuing — the contracted-
    * residual discipline [[incrementalConnectedComponents]] uses, and
    * what a 100 TB run would do too (the residue after the mass rounds
    * is metadata-sized). Whole-problem size gate as in
    * [[connectedComponents]]; q_graph_coloring benches the gate,
    * q_graph_coloring_bsp forces the loop with a 10%-of-fixture tail
    * bound so the distributed phase covers >90% of the color mass.
    */
  def jonesPlassmannColoring(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = ColoringRoundCap,
      driverSolveLimit: Long = DriverSolveEdgeLimit,
      tailSolveVertices: Long = 100000): DataFrame = {
    import spark.implicits._
    val e0 = edges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long"), col("dst").cast("long"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val edgeCount = und.count() // gate + materializes the persist
    requireLcgPriorityDomain(und, "jonesPlassmannColoring")
    def pri(v: Long): Long = (v * 1103515245L + 12345L) % 2147483648L
    // The SAME rounds, in memory — the whole-problem gate path AND the
    // tail finish (which seeds `colored` with the boundary colors and
    // continues the round numbering).
    def simulateRounds(verts: Array[Long], hpAdj: Long => Array[Long],
        colored: scala.collection.mutable.LongMap[Int],
        startRound: Int): Seq[(Long, Int, Int)] = {
      val remaining = scala.collection.mutable.HashSet.empty[Long]
      verts.foreach(remaining += _)
      val out = Seq.newBuilder[(Long, Int, Int)]
      var r = startRound - 1
      while (remaining.nonEmpty && r < maxRounds) {
        r += 1
        val newly = remaining.iterator
          .filter(v => hpAdj(v).forall(colored.contains)).toArray
        newly.foreach { v =>
          val used = hpAdj(v).iterator.map(colored(_)).toSet
          val c = Iterator.from(0).find(!used(_)).get
          colored(v) = c
          out += ((v, c, r))
        }
        newly.foreach(remaining -= _)
      }
      require(remaining.isEmpty,
        s"coloring did not converge within $maxRounds rounds")
      out.result()
    }
    if (edgeCount <= driverSolveLimit) {
      val arr = und.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      und.unpersist()
      val hpAdj = arr.groupBy(_._1).map { case (v, es) =>
        v -> es.map(_._2).filter(u => pri(u) < pri(v))
      }
      return simulateRounds(hpAdj.keys.toArray, hpAdj(_),
        scala.collection.mutable.LongMap.empty[Int], 1)
        .toDF("v", "color", "round")
    }
    val priCol = (c: org.apache.spark.sql.Column) =>
      (c * 1103515245L + 12345L) % 2147483648L
    // static: "v waits for dst" edges — priority is arithmetic on the id
    val hpEdges = und.filter(priCol(col("dst")) < priCol(col("src")))
      .localCheckpoint(true)
    var un = und.select(col("src").as("v")).distinct().localCheckpoint(true)
    var unCount = un.count()
    // colored state = FLAT UNION of per-round checkpointed `newly` leaves
    // (the multiBrandesDeltas discipline): any consumer re-executes only
    // a union of materialized blocks, never a nested join/agg lineage —
    // per-round cost is exactly TWO materializations (newly, un) + the
    // termination count, measured 2.7x faster than checkpointing the
    // accumulated frame (and 2.6x faster than checkpoint cadence, whose
    // nested mex recomputation dominated).
    // frames carry (v, color) ONLY — the round number is attached as a
    // literal over the checkpointed leaf at the very end, never inside
    // the per-round plan: an embedded round literal changes the generated
    // code every round and turns the codegen cache into a per-round
    // recompile
    val empty = Seq.empty[(Long, Int)].toDF("v", "color")
    var newlyFrames = List.empty[(Int, DataFrame)]
    def coloredSoFar: DataFrame = (empty :: newlyFrames.map(_._2)).reduce(_ union _)
    // one JP level: the ready frontier of `unc` colored by the shared
    // sorted-set mex (degree-agnostic, one shuffle — see [[mexAggExpr]];
    // this lifted the r9 bitmask spelling's hp-degree<63 REFUSAL of
    // hub-bearing graphs, and with it the up-front max-degree scan).
    // (Size-gated frontier BROADCASTS — the multiSourceBfsSigma
    // discipline — were tried here and measured 1.4x SLOWER: five
    // broadcasts per level each pay a driver collect+distribute, which
    // at local[32] costs more than the small shuffles they replace.
    // Shuffle joins + AQE coalescing stay.)
    def roundStep(unc: DataFrame): DataFrame = {
      val blocked = hpEdges
        .join(unc.select(col("v").as("uv")), col("dst") === col("uv"), "left_semi")
        .select(col("src").as("v"))
      val ready = unc.join(blocked, Seq("v"), "left_anti")
      // hp-neighbor color mex of the ready frontier (hp-neighbors all
      // colored by definition; no colored hp-neighbors → no row → mex 0)
      val masks = hpEdges
        .join(ready.select(col("v").as("rv")), col("src") === col("rv"), "left_semi")
        .join(coloredSoFar.select(col("v").as("cv"), col("color").as("ncolor")),
          col("dst") === col("cv"))
        .groupBy(col("src").as("mv"))
        .agg(mexAggExpr.as("mex"))
      ready.join(masks, col("v") === col("mv"), "left")
        .select(col("v"), coalesce(col("mex"), lit(0)).cast("int").as("color"))
    }
    // TWO levels per un-materialization (the fused-superstep discipline):
    // level 1's output must materialize (consumed by level 2's mask join
    // and both frontier anti-joins), but the intermediate uncolored set
    // `un1` is a single anti-join over materialized leaves — cheap to
    // re-execute — so the barrier-expensive un checkpoint + termination
    // count run once per PAIR of rounds. An empty level is only possible
    // when nothing remains (the min-priority uncolored vertex is always
    // ready), so round numbering stays aligned with the oracle's unroll.
    var r = 0
    while (unCount > tailSolveVertices && r + 2 <= maxRounds) {
      val newly1 = roundStep(un).localCheckpoint(true)
      newlyFrames ::= (r + 1) -> newly1
      val un1 = un.join(newly1.select("v"), Seq("v"), "left_anti")
      val newly2 = roundStep(un1).localCheckpoint(true)
      newlyFrames ::= (r + 2) -> newly2
      r += 2
      un = un1.join(newly2.select("v"), Seq("v"), "left_anti").localCheckpoint(true)
      unCount = un.count()
    }
    val emptyR = Seq.empty[(Long, Int, Int)].toDF("v", "color", "round")
    var colored = (emptyR :: newlyFrames.map { case (rr, df) =>
      df.select(col("v"), col("color"), lit(rr).as("round")) }).reduce(_ union _)
    if (unCount > 0) {
      // a maxRounds exit with a BIG remainder must fail loudly here, not
      // attempt an unbounded gather
      require(unCount <= tailSolveVertices,
        s"coloring did not converge within $maxRounds distributed rounds" +
          s" ($unCount vertices still uncolored)")
      // tail finish: gather the residual subproblem (remaining vertices'
      // hp-edges + boundary colors) — ≤ tailSolveVertices × avg-degree
      // pairs — and complete the SAME rounds in memory
      val remV = un.select("v").rdd.map(_.getLong(0)).collect()
      val remHp = hpEdges
        .join(un.select(col("v").as("uv")), col("src") === col("uv"), "left_semi")
        .localCheckpoint(true) // feeds the pair gather AND the boundary join
      val pairs = remHp.rdd.map(x => (x.getLong(0), x.getLong(1))).collect()
      val boundary = remHp
        .join(colored.select(col("v").as("cv"), col("color").as("bc")),
          col("dst") === col("cv"))
        .select(col("cv"), col("bc")).distinct()
        .rdd.map(x => (x.getLong(0), x.getInt(1))).collect()
      val cmap = scala.collection.mutable.LongMap.empty[Int]
      boundary.foreach { case (v, c) => cmap(v) = c }
      val hpAdj = pairs.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      val tail = simulateRounds(remV,
        v => hpAdj.getOrElse(v, Array.empty[Long]), cmap, r + 1)
      colored = colored.unionByName(tail.toDF("v", "color", "round"))
    }
    und.unpersist()
    colored
  }

  /** Round cap shared by [[speculativeColoring]]'s two paths and the
    * q_graph_coloring_spec oracle's fixed unroll (the ring fixture
    * converges in 3/4/5/5 rounds at sf0.001/0.01/0.1/1 under the hashed
    * round-1 guess — measured; rounds past convergence are no-ops on
    * both sides, non-convergence within the cap is loud). */
  private[graft] val SpecColoringRoundCap = 12

  /** SPECULATIVE graph coloring — Gebremedhin–Manne conflict-resolution
    * rounds, the barrier-count answer to Jones–Plassmann's depth-bound
    * weakness (the r8 stretch item): JP pays one barrier per priority-DAG
    * level (depth 23 on the sf0.1 ring fixture), while speculation lets
    * every uncolored vertex pick a color each round and uncolors only the
    * loser of each tentative conflict. Round 1 is a HASHED GUESS
    * (pri % 8): a mex start has no committed colors, so every vertex
    * picks 0 and EVERY edge conflicts — the tuning ledger's numbers at
    * sf0.1, each measured: mex start = 7 rounds but round-2 uncolored
    * 12379/15000 and 9.1 s (REJECTED); hashed start = 5 rounds, round-2
    * uncolored 2628, 7.3 s ≈ JP-BSP's 7.4 s at local[32]. The tie is the
    * expected local-mode result — barriers cost ~nothing in one JVM, so
    * halving them pays nothing here; on a multi-executor cluster the
    * barrier count IS the cost driver and 5 synchronization rounds vs
    * JP's 12 fused (depth 23) is the scale win this operator exists for.
    * Determinism (the replayable-oracle requirement): tentative colors
    * are a pure function of the committed state, and the conflict rule is
    * fixed — of two adjacent SAME-tentative-color vertices the HIGHER LCG
    * priority uncolors (priorities injective on [0, 2^31), gated loudly),
    * so the final coloring and each vertex's commit round replay
    * bit-for-bit in SQL. The result is a proper coloring but NOT the
    * sequential-greedy one — q_graph_coloring keeps that contract.
    * Progress is guaranteed (the min-priority uncolored vertex never
    * loses a conflict), `maxRounds` bounds both paths loudly. Per
    * distributed round: one committed-neighbor sorted-set mex
    * ([[mexAggExpr]] — degree-agnostic since r10, one shuffle) and one
    * tentative×tentative conflict join keyed on the edge — both shrink
    * with the uncolored set.
    * Returns `(v, color, round)`, round = commit round, 1-based. */
  def speculativeColoring(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = SpecColoringRoundCap,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    val e0 = edges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long"), col("dst").cast("long"))
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val edgeCount = und.count() // gate + materializes the persist
    requireLcgPriorityDomain(und, "speculativeColoring")
    def pri(v: Long): Long = (v * 1103515245L + 12345L) % 2147483648L
    if (edgeCount <= driverSolveLimit) {
      val arr = und.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      und.unpersist()
      val adj = arr.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      val color = scala.collection.mutable.LongMap.empty[Int]
      val out = Seq.newBuilder[(Long, Int, Int)]
      var un = adj.keySet
      var r = 0
      while (un.nonEmpty && r < maxRounds) {
        r += 1
        val tent = un.iterator.map { v =>
          if (r == 1) v -> (pri(v) % 8).toInt
          else {
            val used = adj(v).iterator.flatMap(color.get).toSet
            v -> Iterator.from(0).find(c => !used(c)).get
          }
        }.toMap
        val losers = tent.keysIterator.filter { v =>
          adj(v).exists(u => tent.get(u).contains(tent(v)) && pri(v) > pri(u))
        }.toSet
        (tent.keySet -- losers).foreach { v =>
          color(v) = tent(v); out += ((v, tent(v), r))
        }
        un = losers
      }
      require(un.isEmpty,
        s"speculative coloring did not converge within $maxRounds rounds")
      return out.result().toDF("v", "color", "round")
    }
    val priCol = (c: org.apache.spark.sql.Column) =>
      (c * 1103515245L + 12345L) % 2147483648L
    // committed state = flat union of per-round checkpointed leaves (the
    // jonesPlassmannColoring discipline — consumers re-execute a union of
    // materialized blocks, never a nested lineage)
    val empty = Seq.empty[(Long, Int)].toDF("v", "color")
    var newlyFrames = List.empty[(Int, DataFrame)]
    def committed: DataFrame = (empty :: newlyFrames.map(_._2)).reduce(_ union _)
    var un = und.select(col("src").as("v")).distinct().localCheckpoint(true)
    var unCount = un.count()
    var r = 0
    while (unCount > 0 && r < maxRounds) {
      r += 1
      // Round 1: a hashed GUESS (pri % 8) instead of the mex — with no
      // committed colors every mex is 0 and EVERY edge conflicts, which
      // measured as the variant's dominant cost (round-2 uncolored
      // 12379 → 2628 of 15000 at sf0.1 under the guess). Rounds ≥ 2:
      // mex over COMMITTED neighbor colors (no colored neighbor → mask
      // 0 → mex 0).
      val tent = (if (r == 1)
        un.select(col("v"), (priCol(col("v")) % 8).cast("int").as("color"))
      else {
        val masks = und
          .join(un.select(col("v").as("uv")), col("src") === col("uv"), "left_semi")
          .join(committed.select(col("v").as("cv"), col("color").as("ncolor")),
            col("dst") === col("cv"))
          .groupBy(col("src").as("mv"))
          .agg(mexAggExpr.as("mex"))
        un.join(masks, col("v") === col("mv"), "left")
          .select(col("v"), coalesce(col("mex"), lit(0)).cast("int").as("color"))
      }).localCheckpoint(true)
      // conflicts: adjacent equal TENTATIVE colors; the higher priority
      // endpoint uncolors (und is symmetric, so one directed read
      // per pair suffices: keep the src side when it is the loser)
      val losers = und
        .join(tent.select(col("v").as("src"), col("color").as("ca")), Seq("src"))
        .join(tent.select(col("v").as("dst"), col("color").as("cb")), Seq("dst"))
        .filter(col("ca") === col("cb") && priCol(col("src")) > priCol(col("dst")))
        .select(col("src").as("v")).distinct().localCheckpoint(true)
      val newly = tent.join(losers, Seq("v"), "left_anti").localCheckpoint(true)
      newlyFrames ::= r -> newly
      un = losers
      unCount = un.count()
    }
    require(unCount == 0,
      s"speculative coloring did not converge within $maxRounds rounds" +
        s" ($unCount vertices still uncolored)")
    und.unpersist()
    val emptyR = Seq.empty[(Long, Int, Int)].toDF("v", "color", "round")
    (emptyR :: newlyFrames.map { case (rr, df) =>
      df.select(col("v"), col("color"), lit(rr).as("round")) }).reduce(_ union _)
  }

  /** INCREMENTAL connected-components maintenance over INSERT-only edge
    * deltas — the graph-analytics consumer of the commit-log store's
    * snapshot diffs: given the previous CC state `(v, comp)` (comp = min
    * vertex id, the [[connectedComponents]] contract) and the edges
    * INSERTED since, returns the new state WITHOUT re-traversing the old
    * graph. Each inserted edge is contracted to its endpoints' previous
    * components (a new vertex owns itself), and CC runs on that CONTRACTED
    * component graph — sized by the delta and the components it touches,
    * never by the full graph — then old labels remap through the result.
    * Correctness of the min-label contract is compositional: each previous
    * comp id is already the min of its member set, so the min over a merged
    * group of comp ids IS the global min vertex — the output is equal to
    * `connectedComponents(oldEdges ∪ inserted)` (pinned in GraphSpec and
    * oracled end-to-end by q_graph_cc_incremental).
    *
    * DELETIONS are out of scope by design, loudly: removing an edge can
    * split a component, which cannot be decided from `(state, delta)`
    * without reachability over the surviving edges — a deletion-bearing
    * diff must recompute the affected components from the new snapshot.
    */
  def incrementalConnectedComponents(spark: SparkSession, prevState: DataFrame,
      inserted: DataFrame, maxIter: Int = 50,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    val pv = prevState.select(col("v").cast("long").as("v"),
      col("comp").cast("long").as("comp")).localCheckpoint(true)
    val ins = inserted.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    // endpoints → previous comp (vertices unseen by the old state own
    // themselves); self-loops within one component carry no information
    val m = ins
      .join(pv.select(col("v").as("src"), col("comp").as("cs")), Seq("src"), "left")
      .join(pv.select(col("v").as("dst"), col("comp").as("cd")), Seq("dst"), "left")
      .select(coalesce(col("cs"), col("src")).as("a"),
        coalesce(col("cd"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
    val compEdges = m.union(m.select(col("b").as("a"), col("a").as("b")))
      .distinct().select(col("a").as("src"), col("b").as("dst"))
    // CC on the contracted graph: |edges| ≤ 2·|delta| regardless of the
    // base graph's size — this is the whole point of the maintenance path
    val remap = connectedComponents(spark, compEdges, maxIter, driverSolveLimit)
      .select(col("v").as("comp"), col("comp").as("ncomp"))
    val newVerts = ins.select(col("src").as("v")).union(ins.select(col("dst").as("v")))
      .distinct().join(pv.select("v"), Seq("v"), "left_anti")
    pv.union(newVerts.select(col("v"), col("v").as("comp")))
      .join(remap, Seq("comp"), "left")
      .select(col("v"), coalesce(col("ncomp"), col("comp")).as("comp"))
  }

  /** DELETION-aware incremental CC maintenance (r8 VERDICT #7 — the
    * insert-only family's first delete-bearing member): given the previous
    * state `(v, comp)` (comp = min member id, the [[connectedComponents]]
    * contract), the NEW snapshot's edges, and the two-sided diff
    * (`inserted` = new∖old, `deleted` = old∖new), returns the new state
    * recomputing ONLY the delete-affected components.
    *
    * Why deletes can't ride the contracted-graph path: an insert only
    * MERGES components (state-level information), but a delete may SPLIT
    * one, which is a reachability question over the surviving edges. The
    * scoped answer: let A = components touched by any deleted endpoint
    * and S = their member vertices. An OLD edge never crosses the S
    * boundary (an edge implies same old component, and deleted edges have
    * both endpoints in S by the same argument), so the new graph is
    * exactly [S-induced new edges] ⊎ [untouched outside components] ⊎
    * [inserted edges]. CC re-runs on R = S-induced new edges ∪ ALL
    * inserted edges (cost ∝ affected components + delta, never the full
    * graph — the iterative traversal is the expensive part and it is
    * S-scoped); then a CONTRACTED pass glues R-labels of R-vertices
    * outside S to their old component labels (each label is already its
    * part's min member id, so the min over a glued group IS the global
    * min — the same compositional argument as the insert-only path).
    * Vertices of S with no surviving edge drop out, matching a full
    * recompute over an edge-defined universe. The one full-edge-set cost
    * is the pair of semi-joins extracting S-induced edges — one scan, no
    * traversal; a production layout partitions the edge table by
    * component id so this read is partition-pruned instead. Oracled
    * end-to-end by q_graph_cc_incremental_del (hash-compared against the
    * full recompute over the new snapshot). */
  def incrementalConnectedComponentsDelete(spark: SparkSession,
      newEdges: DataFrame, prevState: DataFrame,
      inserted: DataFrame, deleted: DataFrame,
      maxIter: Int = 50,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    def sym(e: DataFrame): DataFrame = {
      val e0 = e.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    val pv = prevState.select(col("v").cast("long").as("v"),
      col("comp").cast("long").as("comp")).localCheckpoint(true)
    val ins = sym(inserted)
    // affected components: any component touching a deleted endpoint
    // (delta-sized probe into the state, then a comp-keyed semi-join)
    val affComps = sym(deleted).select(col("src").as("v")).distinct()
      .join(pv, Seq("v")).select("comp").distinct()
    val sVerts = pv.join(affComps, Seq("comp"), "left_semi")
      .select("v").localCheckpoint(true)
    // R: new-graph edges inside S, plus every inserted edge
    val rEdges = sym(newEdges)
      .join(sVerts.select(col("v").as("src")), Seq("src"), "left_semi")
      .join(sVerts.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .unionByName(ins).distinct()
    val rLabels = connectedComponents(spark, rEdges, maxIter, driverSolveLimit)
      .localCheckpoint(true)
    // glue: R-vertices OUTSIDE S tie their R-label to their old component
    // (new vertices have no old component and correctly contribute none)
    val glue = rLabels.select(col("v"), col("comp").as("rl"))
      .join(sVerts, Seq("v"), "left_anti")
      .join(pv.select(col("v"), col("comp").as("oc")), Seq("v"))
      .select(col("rl").as("src"), col("oc").as("dst"))
      .filter(col("src") =!= col("dst"))
    // contracted CC over labels only — delta-scale, not graph-scale
    val remap = connectedComponents(spark, glue, maxIter, driverSolveLimit)
      .select(col("v").as("lab"), col("comp").as("nlab"))
    def remapped(vl: DataFrame): DataFrame = vl
      .join(remap, Seq("lab"), "left")
      .select(col("v"), coalesce(col("nlab"), col("lab")).as("comp"))
    val outside = pv.join(sVerts, Seq("v"), "left_anti")
      .join(rLabels.select("v"), Seq("v"), "left_anti")
    remapped(outside.select(col("v"), col("comp").as("lab")))
      .unionByName(remapped(rLabels.select(col("v"), col("comp").as("lab"))))
  }

  /** Shared delta-seeded label-correcting relaxation loop behind the
    * whole incremental-maintenance family ([[incrementalBfsLevels]] /
    * [[incrementalDagLayers]] / [[incrementalSssp]] — min-level, max-layer
    * and min-cost are the same loop with the ordering flipped and the
    * proposal expression swapped, so sharing it makes the loud
    * non-convergence contract uniform BY CONSTRUCTION instead of by
    * per-copy discipline). Round shape: merge the improvements into the
    * state (full-outer `mergeBoth` on the vertex key — the state, the
    * only full-graph-sized frame, is touched once per round by a
    * key-local join), then relax TWO cascade hops inside one job (the
    * expandTwice frontier-doubling discipline applied to label
    * correction: proposals are genuine walk values so they never land on
    * the wrong side of the true label, non-improving candidates are
    * filtered against the merged state, and any relaxation a discarded
    * candidate would have seeded is re-proposed by a later frontier — the
    * fixpoint is unchanged while the barrier count halves). A cascade
    * still live at `maxIter` THROWS — silently returning the truncated
    * state would violate the family's exactness contract (and for DAG
    * layering a live cascade can also mean the delta introduced a cycle).
    * Frames are `(v, label)`; `hop` maps a frontier to its proposals.
    */
  private def labelCorrectLoop(opName: String, state0: DataFrame,
      seed0: DataFrame, hop: DataFrame => DataFrame,
      pick: Column => Column, better: (Column, Column) => Column,
      mergeBoth: (Column, Column) => Column, maxIter: Int): DataFrame = {
    val t0 = System.nanoTime()
    // STATE + OVERLAY, not a re-merged label table (r11): the stored
    // state is touched ONCE (checkpointed here, scanned per round); all
    // improvements accumulate in a cascade-sized overlay. The r10 loop
    // re-materialized the full-graph labels frame through a full-outer
    // merge EVERY round — a graph-sized checkpoint per round paying the
    // merge's exchanges for frontier-sized information. The overlay
    // merge needs no value arithmetic at all: a frontier row was
    // filtered strictly-better against the CURRENT view (state ⊕
    // overlay), so on conflict the frontier value simply wins —
    // anti-join ∪ union, overlay-sized. (`mergeBoth` is retained in the
    // signature for callers' documentation of merge direction; the
    // strictly-better filter makes it the identity here.)
    val base = state0.localCheckpoint(true)
    var overlay = seed0.localCheckpoint(true)
    var frontier = overlay
    var n = frontier.count()
    var i = 0
    trace(f"$opName relax seed n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    while (n > 0 && i < maxIter) {
      val h1 = hop(frontier)
      frontier = h1.union(hop(h1))
        .groupBy("v").agg(pick(col("label")).as("cand"))
        .join(base.withColumnRenamed("label", "bl"), Seq("v"), "left")
        .join(overlay.withColumnRenamed("label", "ol"), Seq("v"), "left")
        .withColumn("cur", coalesce(col("ol"), col("bl")))
        .filter(col("cur").isNull || better(col("cand"), col("cur")))
        .select(col("v"), col("cand").as("label"))
        .localCheckpoint(true)
      n = frontier.count()
      if (n > 0) overlay = overlay
        .join(frontier.select("v"), Seq("v"), "left_anti")
        .unionByName(frontier)
        .localCheckpoint(true)
      i += 2
      trace(f"$opName relax rounds=$i n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (n > 0) throw new IllegalStateException(
      s"$opName did not converge in $maxIter rounds - the improvement " +
        "cascade exceeds the cap (for DAG layering this can also mean " +
        "the delta introduced a cycle); raise maxIter or recompute from " +
        "the new snapshot")
    base.join(overlay.select("v"), Seq("v"), "left_anti")
      .unionByName(overlay)
  }

  /** INCREMENTAL BFS-level maintenance over INSERT-only edge deltas — the
    * traversal-family consumer of the commit-log store's snapshot diffs
    * (the [[incrementalConnectedComponents]] pattern applied to A5's BFS,
    * reference `secondary_server.c:588-619`): given the previous snapshot's
    * level state `(v, level)` and the edges INSERTED since, returns the new
    * snapshot's EXACT levels without re-traversing the old graph. Inserting
    * edges can only lower levels or reach new vertices, so maintenance is a
    * label-correcting relaxation seeded by the inserted edges alone: each
    * inserted (u,w) with known level(u) proposes level(u)+1 for w, and
    * improvements propagate along the full edge list — but every superstep
    * joins the edge list against ONLY the just-improved vertices, so the
    * work is sized by the delta's cascade region (at sf0.1 a 1% edge delta
    * touches 817 of 15 000 vertices, two cascade hops per barrier), never
    * the base graph.
    * Convergence to the exact fixpoint is guaranteed: the previous levels
    * over-estimate the new graph's levels everywhere (edge insertion is
    * monotone), labels are integers bounded below, and the BFS relaxation
    * fixpoint is unique — equality with a full re-traversal is pinned in
    * GraphSpec and oracled end-to-end by q_graph_bfs_incremental.
    *
    * DELETIONS are out of scope by design, loudly, for the same reason as
    * in [[incrementalConnectedComponents]]: removing an edge can RAISE
    * levels or disconnect vertices, which cannot be decided from
    * (state, delta) without re-traversing the surviving edges.
    */
  def incrementalBfsLevels(spark: SparkSession, fullEdges: DataFrame,
      prevLevels: DataFrame, inserted: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = fullEdges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    val state0 = prevLevels.select(col("v").cast("long").as("v"),
      col("level").cast("int").as("label"))
    // Seed: relax ONLY the inserted edges against the previous state. An
    // inserted edge whose source is (still) unreachable contributes nothing
    // yet — if a cascade later reaches it, the full-edge-list relaxation
    // re-proposes it, so no improvement is lost.
    val seed0 = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("w"))
      .join(state0.select(col("v").as("u"), col("label").as("ul")), Seq("u"))
      .groupBy(col("w").as("v")).agg((min("ul") + 1).cast("int").as("cand"))
      .join(state0, Seq("v"), "left")
      .filter(col("label").isNull || col("cand") < col("label"))
      .select(col("v"), col("cand").as("label"))
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hl"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst")),
        col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg((min("hl") + 1).cast("int").as("label"))
    val out = labelCorrectLoop("incrementalBfsLevels", state0, seed0, hop,
      min, _ < _, least(_, _), maxIter)
    e.unpersist()
    out.select(col("v"), col("label").cast("int").as("level"))
  }

  /** Shared delta-scoped SUPPORT CASCADE of the delete-bearing traversal
    * maintainers (BFS levels / weighted SSSP / DAG layers — one
    * tightness algebra: a parent p supports child v iff a surviving edge
    * (p, v, w) satisfies lab(p) + w = lab(v), with w ≡ 1 for the
    * unweighted/unit-step members; min-vs-max direction only matters to
    * the RE-relaxation, not to which stored labels the deletes
    * invalidate). Wave 0 = heads of deleted edges left with no tight
    * parent outside the unsettled set; wave i+1 = tight children of wave
    * i failing the same check (a child wrongly kept by a not-yet-fallen
    * parent is re-examined the wave that parent falls). Per-wave work is
    * frontier-sized; waves are bounded by `maxIter`, loudly. Inputs:
    * `e`/`del` as (src, dst, w) LONGs, `pv` as (v, lab) LONGs. Returns
    * the unsettled vertex set (v), checkpointed. */
  private def supportCascade(spark: SparkSession, e: DataFrame, pv: DataFrame,
      del: DataFrame, maxIter: Int, opName: String,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    // TIGHT SUPPORT GRAPH, built ONCE (r11, the verdict's tail-gather
    // task resolved at its root): the support algebra only ever reads
    // the OLD labels (pv is frozen for the whole cascade — tightness is
    // lab(p) + w = lab(v) over the PREVIOUS state), so the entire tight
    // relation is static and can be materialized up front with two
    // joins instead of being re-derived inside every wave (the r10 loop
    // paid 2 e-scans + 2 pv-joins per sub-wave; with tightE each
    // sub-wave is one expansion probe + one support probe). A vertex's
    // stored label is invalidated exactly when its LAST tight parent
    // falls — which makes the cascade a Kahn-style worklist over
    // tightE's support counts, and therefore DRIVER-SOLVABLE under the
    // family's size gate (the [[dagLayers]]/[[connectedComponents]]
    // discipline): ≤`driverSolveLimit` tight edges collect once and the
    // ~25-wave barrier tail (513 stages at sf0.1, each wave paying
    // fixed scheduling for frontier-sized work) becomes one in-memory
    // pass. Past the gate the BSP wave loop below runs over the same
    // materialized tightE — the 100 TB path, benched by the forced-BSP
    // twin q_graph_dag_layers_incremental_del_bsp and spec-pinned equal.
    val tightE = e
      .join(pv.select(col("v").as("src"), col("lab").as("pl")), Seq("src"))
      .join(pv.select(col("v").as("dst"), col("lab").as("cl")), Seq("dst"))
      .filter(col("cl") === col("pl") + col("w"))
      .select(col("src").as("p"), col("dst").as("c")).distinct()
      .localCheckpoint(true)
    val tightN = tightE.count()
    // Wave-0 candidates: heads of deleted edges that were TIGHT under
    // the old labels (an untight deleted edge never carried the label).
    val cand0v = del
      .join(pv.select(col("v").as("src"), col("lab").as("ul")), Seq("src"))
      .join(pv.select(col("v").as("dst"), col("lab").as("wl")), Seq("dst"))
      .filter(col("wl") === col("ul") + col("w"))
      .select(col("dst").as("v")).distinct()
      .repartition(1).localCheckpoint(true)
    if (tightN <= driverSolveLimit) {
      // Driver worklist: supCount(v) = distinct surviving tight parents;
      // seeds = wave-0 candidates already at zero; each unsettled vertex
      // decrements its tight children once, a child unsettles when its
      // count hits zero. Least-fixpoint semantics — identical to the
      // wave loop's (GraphSpec pins equality with the gate forced off).
      val t0 = System.nanoTime()
      val pairs = tightE.collect().map(r => (r.getLong(0), r.getLong(1)))
      val seeds = cand0v.collect().map(_.getLong(0))
      val supCount = scala.collection.mutable.LongMap.empty[Int]
      val children = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      pairs.foreach { case (p, c) =>
        supCount(c) = supCount.getOrElse(c, 0) + 1
        children.getOrElseUpdate(p, scala.collection.mutable.ArrayBuffer.empty) += c
      }
      val unsettled = scala.collection.mutable.LinkedHashSet.empty[Long]
      val queue = scala.collection.mutable.Queue.empty[Long]
      seeds.foreach(v => if (supCount.getOrElse(v, 0) == 0) queue += v)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        if (!unsettled.contains(v)) {
          unsettled += v
          children.getOrElse(v, Nil).foreach { c =>
            supCount(c) -= 1
            if (supCount(c) == 0) queue += c
          }
        }
      }
      trace(f"$opName cascade driver-solved tightN=$tightN " +
        f"unsettled=${unsettled.size} t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      return unsettled.toSeq.toDF("v").repartition(1).localCheckpoint(true)
    }
    val emptyU = Seq.empty[Long].toDF("v")
    var uFrames = List.empty[DataFrame]
    def unsettledAll: DataFrame = (emptyU :: uFrames).reduce(_ union _)
    // Frontiers are CASCADE-sized (hundreds of rows at sf0.1, frontier ∝
    // delta never graph) but were checkpointed at cluster parallelism —
    // making every later wave's unsettledAll union drag 32 near-empty
    // tasks PER ACCUMULATED WAVE through both anti-joins. repartition(1)
    // first: a w-wave cascade's state is then w single-partition leaves
    // (upstream join stages keep their parallelism; only the tiny result
    // collapses). Measured r10 at sf0.1, same-session three-maintainer
    // bench (full ledger incl. two rejected variants: PLANS.md r10):
    // this + the two-wave fusion + the checkpointed-frame broadcasts
    // below took q_graph_dag_layers_incremental_del 9.62 → 7.59 s,
    // bfs_del 5.53 → 5.12, sssp_del 5.88 → 5.26.
    def ckpt(df: DataFrame): DataFrame = df.repartition(1).localCheckpoint(true)
    // Count-gated BROADCAST of every frontier/delta-derived join side:
    // checkpointed frontiers have unknown stats, so without the hint
    // every per-wave join SHUFFLED e and pv both ways — the r10 barrier
    // instrumentation showed the cascade paying ~25 stages/wave (dagdel
    // 572 stages vs the insert maintainer's 224) at ~17 ms/stage of pure
    // scheduling. Cascade frames are delta-sized by construction (work ∝
    // frontier, the operator's whole contract); the gate flips back to
    // shuffle joins if the accumulated unsettled set outgrows the
    // broadcast budget — the seen-set discipline of the BFS family.
    // (A "fold the distinct()s into the single-partition checkpoint"
    // variant — dedup as a 1-task agg after repartition(1), no per-wave
    // distinct shuffles — was tried and REJECTED: 8.64 → 10.97 s on the
    // same-session three-maintainer bench; serializing the dedup into
    // the collapse task costs more than the small shuffles it removes.)
    // ONLY already-checkpointed single-partition frames get the hint — a
    // materialized ≤frontier-sized frame broadcasts for the cost of one
    // driver hop, while hinting DERIVED plans (candidates, support
    // in-edges) forces an extra materialize-and-collect per join and
    // measured SLOWER than the shuffles it replaced (9.8 → 11.8 s on the
    // same-session three-maintainer bench — rejected; ledger PLANS.md).
    // The gate counts EVERY frame a subsequent plan may broadcast: the
    // delete batch and both sub-waves of each fused step (review
    // finding: the sub-wave fA is NOT bounded by the entering frontier —
    // one deleted support edge upstream of a high-out-degree vertex
    // fans out to ~out-degree unsettled children — so it must be
    // measured BEFORE any plan wraps it in broadcast(); the count is a
    // 1-task job on the single-partition checkpoint).
    var cumGated = 0L
    def small(df: DataFrame): DataFrame =
      if (cumGated <= 200000L) broadcast(df) else df
    // Both wave probes ride the materialized tightE: expansion is one
    // (p → c) probe, the support check one (c → p) probe + anti-join —
    // the per-wave pv joins and tightness filters of the r10 loop are
    // gone (they were recomputing the static tight relation every wave).
    def dropSupported(cand: DataFrame, unsettled: DataFrame): DataFrame = {
      val supported = cand
        .join(tightE.select(col("p"), col("c").as("v")), Seq("v"))
        .join(small(unsettled.select(col("v").as("p"))), Seq("p"), "left_anti")
        .select("v").distinct()
      cand.join(supported, Seq("v"), "left_anti")
    }
    def nextWave(fr: DataFrame): DataFrame = {
      val cand = tightE
        .join(small(fr.select(col("v").as("p"))), Seq("p"))
        .select(col("c").as("v")).distinct()
        .join(small(unsettledAll.select("v")), Seq("v"), "left_anti")
      dropSupported(cand, unsettledAll)
    }
    val t0 = System.nanoTime()
    var frontier = ckpt(dropSupported(cand0v, emptyU))
    var n = frontier.count()
    cumGated += n
    var waves = 0
    trace(f"$opName cascade wave0 n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    // guard admits the FULL fused step (r10 ADVICE: `waves < maxIter`
    // with `waves += 2` let an odd maxIter run maxIter+1 actual waves —
    // the loud convergence bound was off by one wave vs its message)
    while (n > 0 && waves + 2 <= maxIter) {
      // TWO waves per termination count for TERMINATION purposes (the
      // fused-superstep discipline; r9 VERDICT #2): fA empty ⇒ fB empty,
      // so only fB's count gates the loop. The SUB-WAVE IS materialized —
      // it feeds the next wave's expansion, both its anti-joins, and the
      // result union, and the recorded dagLayers-batching failure mode
      // (3 recomputes of an unmaterialized sub-frame) applies verbatim —
      // and it IS counted for the broadcast gate (a 1-task job on the
      // single-partition checkpoint): fan-out means fA is NOT bounded by
      // the entering frontier, and an unmeasured frame must never reach
      // broadcast().
      // (A TRUE two-waves-per-barrier fusion — fA persist()ed inside one
      // union job, fB's fA-derived sides unhinted for AQE to flip at
      // runtime — was tried r13 and REJECTED on measurement: dagdel-BSP
      // 11.0 → 15.1 s, barrier_stages 440 → 647 at sf0.1. The broadcast
      // gate is the fusion's real obstruction: fB's plan must either
      // read fA unhinted (AQE shuffles BOTH sides of every fB join
      // before its runtime flip — the measured +47% stages) or
      // broadcast a frame whose size no job has measured, which this
      // loop's own review rule forbids at scale. The two-materialization
      // shape IS the safe fixpoint of that constraint; ledger PLANS.md
      // r13.)
      waves += 2
      uFrames ::= frontier
      val fA = ckpt(nextWave(frontier))
      cumGated += fA.count() // gates fB's plan, built next
      uFrames ::= fA
      val fB = ckpt(nextWave(fA))
      frontier = fB
      n = fB.count()
      cumGated += n
      trace(f"$opName cascade waves=$waves n=$n cum=$cumGated " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      // Bound the unsettledAll union depth (r9 VERDICT #9): past ~12
      // leaves, collapse the accumulated waves into ONE single-partition
      // leaf — a deep cascade then carries O(1) legs instead of O(waves),
      // at one extra tiny job per dozen waves.
      if (uFrames.size >= 12) uFrames = List(ckpt(unsettledAll))
    }
    require(n == 0,
      s"$opName: unsettled cascade still live after $maxIter waves — raise maxIter")
    ckpt(unsettledAll.select("v"))
  }

  /** DELETION-aware incremental BFS-level maintenance — the traversal
    * member of the delete-bearing family (with
    * [[incrementalConnectedComponentsDelete]]): deleting an edge can
    * RAISE levels or disconnect vertices, undecidable from (state, delta)
    * without knowing whether an alternative parent survives. The scoped
    * answer (the Ramalingam–Reps shape): a stored level stays VALID iff
    * the vertex keeps a SUPPORT CHAIN to the seed — a surviving parent at
    * level−1 that is itself supported. The UNSETTLED set grows by
    * delta-scoped waves (per-wave work ∝ frontier, never the graph):
    * wave 0 = heads of deleted edges left with no surviving level−1
    * parent outside the unsettled set, wave i+1 = support-children of
    * wave i failing the same check (a child wrongly kept by a
    * not-yet-unsettled parent is re-examined the wave that parent falls).
    * Settled levels are valid UPPER BOUNDS on the new graph (their
    * support chain IS a surviving path of that length); unsettled levels
    * are discarded and recomputed by the family's shared min-relaxation
    * ([[labelCorrectLoop]]) seeded with the settled boundary AND the
    * inserted-edge relaxation — one fixpoint serves both diff sides, and
    * inserts may lower settled levels too. Unsettled vertices no
    * surviving path reaches drop out, matching the full recompute's
    * edge-defined reachable set. */
  def incrementalBfsLevelsDelete(spark: SparkSession, newEdges: DataFrame,
      prevLevels: DataFrame, inserted: DataFrame, deleted: DataFrame,
      maxIter: Int = 50,
      cascadeDriverLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    val e = newEdges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val pv = prevLevels.select(col("v").cast("long").as("v"),
      col("level").cast("int").as("level")).localCheckpoint(true)
    val unsettled = supportCascade(spark,
      e.withColumn("w", lit(1L)),
      pv.select(col("v"), col("level").cast("long").as("lab")),
      deleted.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), lit(1L).as("w")),
      maxIter, "incrementalBfsLevelsDelete", cascadeDriverLimit)
    val state0 = pv.join(unsettled, Seq("v"), "left_anti")
      .select(col("v"), col("level").cast("int").as("label"))
      .localCheckpoint(true)
    // seeds: (a) settled boundary proposals into the unsettled region,
    // (b) the inserted-edge relaxation (the insert-only path's seed) —
    // an insert from an unsettled/unreached source contributes later via
    // the full-edge-list propagation, so no improvement is lost
    val seedBoundary = e
      .join(state0.select(col("v").as("src"), col("label").as("pl")), Seq("src"))
      .join(unsettled.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("dst").as("v")).agg((min("pl") + 1).cast("int").as("label"))
    val seedIns = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("w"))
      .join(state0.select(col("v").as("u"), col("label").as("ul")), Seq("u"))
      .groupBy(col("w").as("v")).agg((min("ul") + 1).cast("int").as("label"))
    val seed0 = seedBoundary.unionByName(seedIns)
      .groupBy("v").agg(min("label").cast("int").as("label"))
      .join(state0.select(col("v"), col("label").as("cur")), Seq("v"), "left")
      .filter(col("cur").isNull || col("label") < col("cur"))
      .select("v", "label")
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hl"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst")),
        col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg((min("hl") + 1).cast("int").as("label"))
    labelCorrectLoop("incrementalBfsLevelsDelete", state0, seed0, hop,
      min, _ < _, least(_, _), maxIter)
      .select(col("v"), col("label").cast("int").as("level"))
  }

  /** INCREMENTAL DAG-layer maintenance over INSERT-only edge deltas — the
    * longest-path MIRROR of [[incrementalBfsLevels]]: inserting edges can
    * only RAISE layers (more paths; a former source gaining an in-edge
    * rises above 0), so maintenance is a delta-seeded MAX relaxation.
    * Exactness mirrors the BFS argument reflected: previous layers
    * UNDER-estimate the new DAG's everywhere (every v1 path survives into
    * v2), each proposal layer(u)+1 is a genuine v2 path length so labels
    * never overshoot, and along any longest path an exact-labeled
    * predecessor keeps firing until the unique DAG fixpoint is reached.
    * Old edges between un-improved vertices never need re-firing (the
    * previous state already satisfied them), so work is sized by the
    * delta's cascade region. Fused two cascade hops per barrier, as in
    * the whole family. If the delta creates a CYCLE the relaxation would
    * climb forever — the maxIter cap fails loudly instead of truncating.
    * DELETIONS out of scope by design, loudly: removing an edge can lower
    * layers, undecidable from (state, delta).
    */
  def incrementalDagLayers(spark: SparkSession, fullEdges: DataFrame,
      prevLayers: DataFrame, inserted: DataFrame, maxIter: Int = 200): DataFrame = {
    val e = fullEdges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist()
    val state0 = prevLayers.select(col("v").cast("long").as("v"),
      col("layer").cast("long").as("label"))
    // Seed 1: relax the inserted edges against the previous state.
    val proposals = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("tv"))
      .join(state0.select(col("v").as("u"), col("label").as("ul")), Seq("u"))
      .select(col("tv").as("v"), (col("ul") + 1).as("cand"))
    // Seed 2: a vertex NEW to this snapshot with no in-edges anywhere is a
    // v2 SOURCE — layer 0 by definition, and nothing would ever propose it
    // (unlike the BFS/SSSP family, every DAG vertex carries a layer, so
    // roots must self-seed; non-source new vertices then resolve through
    // the cascade, whose pred chains terminate at seeded sources).
    val newVerts = inserted.select(col("src").cast("long").as("v"))
      .union(inserted.select(col("dst").cast("long").as("v"))).distinct()
      .join(state0.select("v"), Seq("v"), "left_anti")
    val newSources = newVerts
      .join(e.select(col("dst").as("v")).distinct(), Seq("v"), "left_anti")
      .select(col("v"), lit(0L).as("cand"))
    val seed0 = proposals.union(newSources)
      .groupBy("v").agg(max("cand").as("cand"))
      .join(state0, Seq("v"), "left")
      .filter(col("label").isNull || col("cand") > col("label"))
      .select(col("v"), col("cand").as("label"))
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hl"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst")),
        col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg((max("hl") + 1).as("label"))
    val out = labelCorrectLoop("incrementalDagLayers", state0, seed0, hop,
      max, _ > _, greatest(_, _), maxIter)
    e.unpersist()
    out.withColumnRenamed("label", "layer")
  }

  /** DELETION-aware incremental DAG-layer maintenance — the longest-path
    * mirror of [[incrementalBfsLevelsDelete]] with the SAME support-
    * cascade shape (a tight parent here is layer(p) + 1 = layer(w)):
    * deleting edges can LOWER layers or turn vertices into sources, so a
    * stored layer stays valid iff its argmax support chain survives —
    * then it is still ATTAINED in the new DAG (a genuine lower bound the
    * MAX relaxation can only raise via inserts). The unsettled set grows
    * by the same delta-scoped waves; re-relaxation seeds are (a) the
    * settled parents of unsettled vertices, (b) unsettled vertices with
    * NO surviving in-edge — new sources self-seed layer 0, the
    * [[incrementalDagLayers]] lesson — and (c) the inserted-edge
    * proposals. Output is restricted to the new edge-defined universe so
    * fully-deleted vertices vanish. A delta that creates a cycle climbs
    * past the cap and fails loudly, as in the insert-only path. */
  def incrementalDagLayersDelete(spark: SparkSession, newEdges: DataFrame,
      prevLayers: DataFrame, inserted: DataFrame, deleted: DataFrame,
      maxIter: Int = 200,
      cascadeDriverLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    val e = newEdges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val pv = prevLayers.select(col("v").cast("long").as("v"),
      col("layer").cast("long").as("layer")).localCheckpoint(true)
    val unsettled = supportCascade(spark,
      e.withColumn("w", lit(1L)),
      pv.select(col("v"), col("layer").as("lab")),
      deleted.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), lit(1L).as("w")),
      maxIter, "incrementalDagLayersDelete", cascadeDriverLimit)
    val state0 = pv.join(unsettled, Seq("v"), "left_anti")
      .select(col("v"), col("layer").as("label")).localCheckpoint(true)
    // (a) settled parents propose into the unsettled region
    val seedBoundary = e
      .join(state0.select(col("v").as("src"), col("label").as("pl")), Seq("src"))
      .join(unsettled.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("dst").as("v")).agg((max("pl") + 1).as("label"))
    // (b) unsettled vertices with NO surviving in-edge are new sources
    val seedSources = unsettled
      .join(e.select(col("dst").as("v")).distinct(), Seq("v"), "left_anti")
      .select(col("v"), lit(0L).as("label"))
    // (c) inserted-edge proposals against the settled state (an insert
    // from an unlabeled source fires later via the full-edge propagation)
    val seedIns = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("w"))
      .join(state0.select(col("v").as("u"), col("label").as("ul")), Seq("u"))
      .groupBy(col("w").as("v")).agg((max("ul") + 1).as("label"))
    val seed0 = seedBoundary.unionByName(seedSources).unionByName(seedIns)
      .groupBy("v").agg(max("label").as("label"))
      .join(state0.select(col("v"), col("label").as("cur")), Seq("v"), "left")
      .filter(col("cur").isNull || col("label") > col("cur"))
      .select("v", "label")
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hl"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst")),
        col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg((max("hl") + 1).as("label"))
    labelCorrectLoop("incrementalDagLayersDelete", state0, seed0, hop,
      max, _ > _, greatest(_, _), maxIter)
      .withColumnRenamed("label", "layer")
      .join(edgeUniverse(newEdges), Seq("v"), "left_semi")
  }

  /** Synchronous k-core peel over RAW directed edges (self-loops dropped,
    * duplicates collapsed at the undirected level): each round recomputes
    * every surviving vertex's degree among survivors and drops those
    * below `k`. Fixed `rounds` (not peel-to-convergence) so the DuckDB
    * oracle can unroll the identical recurrence; rounds after the
    * fixpoint are no-ops and the fixpoint is asserted at test scale in
    * GraphSpec. Returns the core's `(v, deg)` with the IN-CORE degree —
    * extracted from q_graph_kcore so the query, the incremental
    * maintainers' stored-state builders, and the spec share one spelling
    * (reference behavior: the subgraph-mining surface of
    * `secondary_server.c`'s traversal queries, SURVEY §2 Part D). */
  def kcorePeel(spark: SparkSession, rawEdges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    // `rounds` caps the SHRINKING peel rounds only. Convergence detection
    // needs one no-op round beyond the last shrink; that detection round
    // runs beyond the cap for free (it cannot change the output — a
    // post-fixpoint round recomputes degrees within the converged set),
    // so rounds == exact fixpoint depth and rounds == 1 on an
    // already-converged input both succeed instead of throwing (r13
    // ADVICE: the old `require(rounds >= 2)` + hard cap made those cases
    // always throw).
    require(rounds >= 1, s"kcorePeel rounds must be >= 1 (got $rounds)")
    val und = rawEdges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true) // feeds every peel round
    // act appears TWICE per round (src prune + dst prune) — materialize
    // each round's survivor set or the plan doubles per round.
    var deg = sym.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).localCheckpoint(true)
    // Peel to a DETECTED fixpoint, `rounds` as a loud cap (r12, caught by
    // the sf1 hash compare): a round's published deg is counted within
    // the PREVIOUS round's survivors, so stopping on the exact round
    // membership converges publishes one-round-STALE degrees — survivors
    // adjacent to last-round removals read too high (21 vertices at sf1,
    // where the fixed 8-round unroll had no no-op slack left). Count
    // equality ⇒ set equality (survivor sets only shrink), and the first
    // no-op round recomputes degrees within the converged set — exact.
    var prevN = -1L
    var n = deg.count()
    var r = 1
    // `r <= rounds` (not `<`): the iteration that OBSERVES the no-op is
    // the free detection round — the cap bounds shrinking work only.
    while (n != prevN && r <= rounds) {
      r += 1
      val act = deg.select("v")
      deg = sym
        .join(act.select(col("v").as("sv")), col("src") === col("sv"), "left_semi")
        .join(act.select(col("v").as("dv")), col("dst") === col("dv"), "left_semi")
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .localCheckpoint(true)
      prevN = n
      n = deg.count()
    }
    require(n == prevN,
      s"kcorePeel did not converge within $rounds rounds (|core| still $n " +
        "and changing) - raise the cap; publishing a non-fixpoint peel " +
        "would carry stale degrees")
    deg
  }

  /** INCREMENTAL k-core maintenance over a two-sided edge diff — the
    * degeneracy-family member of the delete-bearing maintainers (r10
    * VERDICT #2: every traversal/rank/symmetry-breaking family had
    * insert+delete maintainers; k-core recomputed from scratch). Given
    * the previous snapshot's core `(v, deg)` and BOTH raw edge versions,
    * returns the NEW snapshot's exact k-core without re-peeling the old
    * graph. The order-based-maintenance insight (Sarıyüce et al.'s
    * traversal framing): an edge change perturbs core membership only
    * inside a bounded affected region —
    *
    *  - INSERTS only ADD members (k-core is monotone under edge
    *    insertion, so `prevCore` survives wholesale as a lower bound).
    *    Every new member either touches an inserted edge or neighbors
    *    another new member (else its ≥k core neighbors were already
    *    core-resident on v1 edges and the v1 peel could never have
    *    evicted it — contradiction), so candidates grow by delta-seeded
    *    waves through NON-core vertices with full-v2 degree ≥ k, then a
    *    frozen-core candidate peel (per-round work ∝ candidates; the
    *    core's degree contribution is counted once) keeps exactly those
    *    with ≥k support in core ∪ survivors.
    *  - DELETES only REMOVE members: the eviction cascade re-checks
    *    in-core degrees starting from deleted-edge endpoints, walking to
    *    core neighbors of each eviction — the same frontier-wave shape
    *    as [[supportCascade]], work ∝ cascade.
    *
    * Insert candidates are computed FIRST so the eviction checks count
    * joiner support (a core vertex losing a deleted edge can be saved by
    * a new joiner neighbor); the reverse interaction is safe because the
    * cascade re-checks every candidate adjacent to an eviction. Readout
    * recomputes in-core degree ONLY for vertices whose incident core
    * edge set changed (diff endpoints, joiners, neighbors of joiners or
    * evictions); every other stored degree is reused verbatim — a wrong
    * reuse fails the oracle compare, which replays the full v2 peel.
    * Frontier-derived frames broadcast under the family's count-gate
    * (checkpointed, counted frames only); big frames (core ids, the
    * symmetric edge list) are only ever scanned against broadcast
    * probes, never shuffled per wave. Caps are LOUD: a cascade or
    * candidate region that outgrows its bound throws rather than
    * truncating. */
  def incrementalKCore(spark: SparkSession, v1Raw: DataFrame,
      v2Raw: DataFrame, prevCore: DataFrame, k: Int,
      maxWaves: Int = 30,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    def und(e: DataFrame) = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    val u1 = und(v1Raw).localCheckpoint(true)
    val u2 = und(v2Raw).localCheckpoint(true)
    def undMinus(x: DataFrame, y: DataFrame) = x.join(
      y.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_anti")
    val insU = undMinus(u2, u1).localCheckpoint(true)
    val delU = undMinus(u1, u2).localCheckpoint(true)
    val insN = insU.count(); val delN = delU.count()
    val u2N = u2.count()
    if (u2N <= driverSolveLimit) {
      // DRIVER SOLVE under the family's size gate (r11 — the dagdel
      // tight-support-worklist discipline applied to the whole kcore
      // maintenance: the measured sf0.1 profile was 7 candidate waves +
      // 5 peel rounds + 4 eviction waves ≈ 16 barrier steps of
      // frontier-sized work over a ≤3.5k-vertex subproblem). Identical
      // least-fixpoint algebra, in-memory: candidate BFS through
      // non-core vertices with full-v2 degree ≥ k, Kahn peel against
      // the frozen core, Kahn eviction seeded at deleted-edge endpoints
      // (only delta-contacted vertices can drop — a core vertex's
      // in-base degree falls only via a deleted edge or an evicted
      // neighbor). GraphSpec pins driver == BSP == full recompute with
      // the gate forced off; the >gate wave loop below is the 100 TB
      // path.
      val t0 = System.nanoTime()
      val pairs = u2.collect().map(r => (r.getLong(0), r.getLong(1)))
      val insP = insU.collect().map(r => (r.getLong(0), r.getLong(1)))
      val delP = delU.collect().map(r => (r.getLong(0), r.getLong(1)))
      val coreDeg = scala.collection.mutable.LongMap.empty[Long]
      prevCore.select(col("v").cast("long"), col("deg").cast("long"))
        .collect().foreach(r => coreDeg(r.getLong(0)) = r.getLong(1))
      val adj = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      def addAdj(x: Long, y: Long): Unit =
        adj.getOrElseUpdate(x, scala.collection.mutable.ArrayBuffer.empty) += y
      pairs.foreach { case (a, b) => addAdj(a, b); addAdj(b, a) }
      def deg2(v: Long): Int = adj.get(v).map(_.size).getOrElse(0)
      // candidate region: delta-seeded BFS through non-core, deg ≥ k
      val region = scala.collection.mutable.LinkedHashSet.empty[Long]
      val bfs = scala.collection.mutable.Queue.empty[Long]
      insP.foreach { case (a, b) => Seq(a, b).foreach { v =>
        if (!coreDeg.contains(v) && deg2(v) >= k && region.add(v)) bfs += v } }
      while (bfs.nonEmpty) {
        val v = bfs.dequeue()
        adj.getOrElse(v, Nil).foreach { w =>
          if (!coreDeg.contains(w) && deg2(w) >= k && region.add(w)) bfs += w }
      }
      require(region.size <= math.max(10000L, 20L * insN),
        s"incrementalKCore: candidate region (${region.size} vertices) " +
          s"degenerated past 20x the inserted-edge delta ($insN) — " +
          "maintenance would not be delta-scoped; recompute from the new snapshot")
      // frozen-core Kahn peel: support = neighbors in core ∪ survivors
      val sup = scala.collection.mutable.LongMap.empty[Int]
      region.foreach { v =>
        sup(v) = adj(v).count(w => coreDeg.contains(w) || region.contains(w)) }
      val dead = scala.collection.mutable.Queue.empty[Long]
      val out = scala.collection.mutable.LongMap.empty[Boolean]
      region.foreach(v => if (sup(v) < k) { dead += v; out(v) = true })
      while (dead.nonEmpty) {
        val v = dead.dequeue()
        adj(v).foreach { w =>
          if (region.contains(w) && !out.contains(w)) {
            sup(w) -= 1
            if (sup(w) < k) { out(w) = true; dead += w }
          }
        }
      }
      val joiners = region.filterNot(out.contains)
      // eviction Kahn over kBase = core ∪ joiners with v2 edges: degMap
      // counts kBase neighbors; seeds = deleted-edge endpoints
      val inBase = scala.collection.mutable.LongMap.empty[Boolean]
      coreDeg.keysIterator.foreach(v => inBase(v) = true)
      joiners.foreach(v => inBase(v) = true)
      val degB = scala.collection.mutable.LongMap.empty[Long]
      inBase.keysIterator.foreach { v =>
        degB(v) = adj.get(v).map(_.count(inBase.contains)).getOrElse(0).toLong }
      val evQ = scala.collection.mutable.Queue.empty[Long]
      val evicted = scala.collection.mutable.LongMap.empty[Boolean]
      delP.foreach { case (a, b) => Seq(a, b).foreach { v =>
        if (inBase.contains(v) && !evicted.contains(v) && degB(v) < k) {
          evicted(v) = true; evQ += v } } }
      while (evQ.nonEmpty) {
        val v = evQ.dequeue()
        adj.getOrElse(v, Nil).foreach { w =>
          if (inBase.contains(w) && !evicted.contains(w)) {
            degB(w) -= 1
            if (degB(w) < k) { evicted(w) = true; evQ += w }
          }
        }
      }
      trace(f"incrementalKCore driver-solved u2N=$u2N region=${region.size} " +
        f"joiners=${joiners.size} evicted=${evicted.size} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      val rows = inBase.keysIterator.filterNot(evicted.contains)
        .map(v => (v, degB(v))).toSeq
      return rows.toDF("v", "deg").repartition(1).localCheckpoint(true)
    }
    val sym2 = u2.select(col("a").as("src"), col("b").as("dst"))
      .union(u2.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    val core = prevCore.select(col("v").cast("long").as("v"),
      col("deg").cast("long").as("deg")).localCheckpoint(true)
    val coreIds = core.select("v")
    def ckpt(df: DataFrame): DataFrame = df.repartition(1).localCheckpoint(true)
    // count-gated broadcast of checkpointed delta-sized frames (the
    // supportCascade discipline: only materialized, already-counted
    // frames ever reach broadcast())
    var cumGated = 0L
    def small(df: DataFrame): DataFrame =
      if (cumGated <= 200000L) broadcast(df) else df
    def ends(u: DataFrame): DataFrame =
      u.select(col("a").as("v")).union(u.select(col("b").as("v"))).distinct()

    // ---- insert side: candidate region P, then frozen-core peel -> S
    // full-v2 degree of a (checkpointed, counted) candidate set — one
    // sym2 scan against the broadcast probe, candidate-sized result
    def degFull(w: DataFrame): DataFrame = sym2
      .join(small(w.select(col("v").as("src"))), Seq("src"), "left_semi")
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val insEnds = ckpt(ends(insU).join(coreIds, Seq("v"), "left_anti"))
    cumGated += insEnds.count()
    var frontier = ckpt(degFull(insEnds).filter(col("d") >= k).select("v"))
    var fn = frontier.count(); cumGated += fn
    var pFrames = List(frontier)
    def pAll: DataFrame = pFrames.reduce(_ union _)
    var waves = 0
    while (fn > 0 && waves < maxWaves) {
      waves += 1
      val nbrs = ckpt(sym2
        .join(small(frontier.select(col("v").as("src"))), Seq("src"), "left_semi")
        .select(col("dst").as("v")).distinct()
        .join(coreIds, Seq("v"), "left_anti")
        .join(small(ckpt(pAll)), Seq("v"), "left_anti"))
      cumGated += nbrs.count()
      frontier = ckpt(degFull(nbrs).filter(col("d") >= k).select("v"))
      fn = frontier.count(); cumGated += fn
      trace(s"incrementalKCore cand wave=$waves n=$fn cum=$cumGated")
      pFrames ::= frontier
    }
    require(fn == 0,
      s"incrementalKCore: candidate region still growing after $maxWaves " +
        "waves — the insert cascade exceeds the cap; raise maxWaves or " +
        "recompute from the new snapshot")
    val cand = ckpt(pAll)
    val candN = cand.count(); cumGated += candN
    require(candN <= math.max(10000L, 20L * insN),
      s"incrementalKCore: candidate region ($candN vertices) degenerated " +
        s"past 20x the inserted-edge delta ($insN) — maintenance would " +
        "not be delta-scoped; recompute from the new snapshot")
    // candidate support from the FROZEN core, counted once
    val cntC = ckpt(sym2
      .join(small(cand.select(col("v").as("src"))), Seq("src"), "left_semi")
      .join(coreIds.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("cdC")))
    var surv = cand
    var sn = candN
    var peelRounds = 0
    var stable = sn == 0L
    while (!stable && peelRounds < maxWaves) {
      peelRounds += 1
      val cntS = sym2
        .join(small(surv.select(col("v").as("src"))), Seq("src"), "left_semi")
        .join(small(surv.select(col("v").as("dst"))), Seq("dst"), "left_semi")
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("cdS"))
      val next = ckpt(surv
        .join(cntC, Seq("v"), "left").join(cntS, Seq("v"), "left")
        .filter(coalesce(col("cdC"), lit(0L)) + coalesce(col("cdS"), lit(0L)) >= k)
        .select("v"))
      val nn = next.count(); cumGated += nn
      stable = nn == sn
      surv = next; sn = nn
      trace(s"incrementalKCore peel round=$peelRounds n=$sn")
    }
    require(stable,
      s"incrementalKCore: candidate peel did not stabilize in $maxWaves " +
        "rounds — raise maxWaves or recompute from the new snapshot")
    val joiners = surv // checkpointed, counted (sn)

    // ---- delete side: eviction cascade over core ∪ joiners
    val kBase = coreIds.union(joiners).localCheckpoint(true)
    var evFrames = List.empty[DataFrame]
    def evictedAll: DataFrame = evFrames match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
      case fs => fs.reduce(_ union _)
    }
    // in-core degree of a (checkpointed, counted) affected set: neighbor
    // rows via one broadcast probe, membership via one kBase scan against
    // the broadcast neighbor rows — kBase is never shuffled
    def degInCore(w: DataFrame, evicted: DataFrame): DataFrame = {
      val nb = ckpt(sym2
        .join(small(w.select(col("v").as("src"))), Seq("src"), "left_semi")
        .select(col("src"), col("dst")))
      cumGated += nb.count()
      kBase.join(small(nb), col("v") === col("dst"))
        .join(small(evicted.select(col("v").as("xd"))),
          col("dst") === col("xd"), "left_anti")
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("dk"))
    }
    var affected = ckpt(ends(delU)
      .join(kBase.select(col("v").as("kv")), col("v") === col("kv"), "left_semi"))
    var an = affected.count(); cumGated += an
    var evWaves = 0
    while (an > 0 && evWaves < maxWaves) {
      evWaves += 1
      val ev0 = ckpt(evictedAll)
      cumGated += ev0.count()
      val dk = degInCore(affected, ev0)
      val evictNow = ckpt(affected
        .join(dk, Seq("v"), "left")
        .filter(coalesce(col("dk"), lit(0L)) < k)
        .join(small(ev0.select(col("v").as("xe"))),
          col("v") === col("xe"), "left_anti")
        .select("v"))
      val en = evictNow.count(); cumGated += en
      if (en == 0) { an = 0 }
      else {
        evFrames ::= evictNow
        // next wave: surviving core neighbors of this wave's evictions
        affected = ckpt(sym2
          .join(small(evictNow.select(col("v").as("src"))), Seq("src"), "left_semi")
          .select(col("dst").as("v")).distinct()
          .join(kBase.select(col("v").as("kv")), col("v") === col("kv"), "left_semi")
          .join(small(ckpt(evictedAll)), Seq("v"), "left_anti"))
        an = affected.count(); cumGated += an
        trace(s"incrementalKCore evict wave=$evWaves affected=$an evicted=$en")
      }
    }
    require(an == 0,
      s"incrementalKCore: eviction cascade still live after $maxWaves " +
        "waves — raise maxWaves or recompute from the new snapshot")
    val evicted = ckpt(evictedAll)
    val evN = evicted.count(); cumGated += evN

    // ---- readout: recompute in-core degree ONLY where membership or
    // incident edges changed; reuse every other stored degree verbatim
    val kFinal = kBase.join(small(evicted), Seq("v"), "left_anti")
      .localCheckpoint(true)
    val changedNbrSeeds = ckpt(joiners.union(evicted))
    cumGated += changedNbrSeeds.count()
    val changedNbrs = sym2
      .join(small(changedNbrSeeds.select(col("v").as("src"))), Seq("src"), "left_semi")
      .select(col("dst").as("v"))
    val touched = ckpt(ends(insU).union(ends(delU)).union(changedNbrs)
      .union(joiners).distinct()
      .join(kFinal.select(col("v").as("kv")), col("v") === col("kv"), "left_semi"))
    cumGated += touched.count()
    val nbT = ckpt(sym2
      .join(small(touched.select(col("v").as("src"))), Seq("src"), "left_semi")
      .select(col("src"), col("dst")))
    cumGated += nbT.count()
    val degTouched = kFinal.join(small(nbT), col("v") === col("dst"))
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val untouched = core
      .join(small(touched), Seq("v"), "left_anti")
      .join(small(evicted), Seq("v"), "left_anti")
      .select(col("v"), col("deg"))
    untouched.unionByName(degTouched.select(col("v"), col("deg")))
  }

  /** Synchronous k-truss peel over UNDIRECTED canonical edges (a < b,
    * distinct): each round recomputes every surviving edge's triangle
    * support among survivors (canonical wedge join) and drops those
    * below k−2. Fixed `rounds` so the DuckDB oracle can unroll the
    * identical recurrence; GraphSpec asserts the fixpoint is reached and
    * non-empty at test scale. Returns `(a, b, support)` with the
    * IN-TRUSS support — extracted from q_graph_ktruss so the query, the
    * incremental maintainers' stored-state builders, and the spec share
    * one spelling. */
  def ktrussPeel(spark: SparkSession, und: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var cur = und.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")).localCheckpoint(true)
    var result: DataFrame = cur.withColumn("support", lit(0L))
    // Peel to a DETECTED fixpoint with `rounds` as a loud cap — the
    // kcorePeel discipline (r12): a round's published support is counted
    // among the PREVIOUS round's survivors, so a fixed unroll with no
    // no-op slack publishes stale supports for edges adjacent to
    // last-round removals. Count equality ⇒ set equality (survivor sets
    // only shrink); the first no-op round's supports are exact.
    var prevN = cur.count()
    var converged = false
    var r = 0
    while (!converged && r < rounds) {
      r += 1
      val sym = cur.select(col("a").as("v"), col("b").as("w"))
        .union(cur.select(col("b").as("v"), col("a").as("w")))
      val sup = cur.as("u")
        .join(sym.as("x"), col("x.v") === col("u.a"))
        .join(sym.as("y"), col("y.v") === col("u.b") && col("y.w") === col("x.w"))
        .groupBy(col("u.a").as("a"), col("u.b").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= k - 2)
        .localCheckpoint(true)
      result = sup
      cur = sup.select("a", "b")
      val n = sup.count()
      if (n == prevN) converged = true else prevN = n
    }
    require(converged,
      s"ktrussPeel did not converge within $rounds rounds (|truss| still " +
        s"$prevN and changing) - raise the cap; a non-fixpoint peel " +
        "carries stale supports")
    result
  }

  /** INCREMENTAL k-truss maintenance over a two-sided undirected edge
    * diff — [[incrementalKCore]]'s discipline lifted from vertex-degree
    * to EDGE-TRIANGLE granularity (the remaining degeneracy-family gap,
    * r10 VERDICT "missing" #1): given the previous snapshot's truss
    * `(a, b, support)` and BOTH edge versions, returns the NEW
    * snapshot's exact k-truss without re-peeling the old graph.
    *
    *  - INSERTS only ADD members (more edges ⇒ more triangles ⇒ supports
    *    only grow; the stored truss survives wholesale as a lower
    *    bound). Every entering edge shares a v2-triangle with an
    *    inserted edge or with another entering edge (else its ≥k−2
    *    supporting triangles lay entirely inside v1's survivor set and
    *    the v1 peel could not have dropped it), so candidates grow by
    *    triangle-adjacency waves through non-truss edges whose FULL-v2
    *    support is ≥ k−2, then a frozen-core candidate peel (per-round
    *    wedge probes sized by the candidate set) keeps exactly those
    *    with ≥k−2 triangles inside truss ∪ survivors.
    *  - DELETES only REMOVE members: the eviction cascade re-checks
    *    in-truss supports starting from the co-triangle edges of deleted
    *    truss edges, walking to co-triangle edges of each eviction —
    *    the same frontier-wave shape, one wedge probe per wave.
    *
    * Insert candidates are computed FIRST so eviction support counts
    * joiner triangles (a truss edge losing a deleted triangle can be
    * saved by a new triangle through a joiner). Readout recomputes
    * support ONLY for edges whose triangle set changed (co-triangle
    * edges of deleted/evicted edges within the OLD truss, co-triangle
    * edges of joiners within the NEW truss, and the joiners themselves);
    * every other stored support is reused verbatim — a wrong reuse fails
    * the oracle compare, which replays the full v2 peel. Caps are LOUD:
    * a cascade or candidate region outgrowing its bound throws rather
    * than truncating. */
  def incrementalKTruss(spark: SparkSession, v1Und: DataFrame,
      v2Und: DataFrame, prevTruss: DataFrame, k: Int,
      maxWaves: Int = 30,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    def norm(e: DataFrame) = e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).cast("long").as("a"),
        greatest(col("a"), col("b")).cast("long").as("b"))
      .distinct()
    val u1 = norm(v1Und).localCheckpoint(true)
    val u2 = norm(v2Und).localCheckpoint(true)
    def minus(x: DataFrame, y: DataFrame) = x.join(
      y.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_anti")
    val insE = minus(u2, u1).localCheckpoint(true)
    val delE = minus(u1, u2).localCheckpoint(true)
    val insN = insE.count(); delE.count()
    val u2N = u2.count()
    if (u2N <= driverSolveLimit) {
      // DRIVER SOLVE under the family's size gate — the kcore worklist
      // at TRIANGLE granularity: collect the v2 edge set, run the
      // identical least-fixpoint algebra in memory. Supports are
      // adjacency-set intersections (O(deg) per edge); the candidate
      // region walks triangle-adjacency restricted to P1 (full-v2
      // support ≥ k−2, the strip lesson); peel and eviction are Kahn
      // worklists that decrement the two co-edges of each lost
      // triangle. Eviction needs no delta seeding at all here: the
      // fixpoint — the maximal S ⊆ kBase with every in-S support
      // ≥ k−2 — is a global property, so recomputing in-base supports
      // and evicting everything below threshold converges to the same
      // set the distributed waves reach. GraphSpec pins driver == BSP
      // == full recompute with the gate forced off.
      val t0 = System.nanoTime()
      type E = (Long, Long)
      def key(a: Long, b: Long): E = if (a < b) (a, b) else (b, a)
      val pairs = u2.collect().map(r => (r.getLong(0), r.getLong(1)))
      val insP = insE.collect().map(r => (r.getLong(0), r.getLong(1)))
      val coreSup = scala.collection.mutable.HashMap.empty[E, Long]
      prevTruss.select(col("a").cast("long"), col("b").cast("long"),
        col("support").cast("long")).collect()
        .foreach(r => coreSup(key(r.getLong(0), r.getLong(1))) = r.getLong(2))
      val adj = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.HashSet[Long]]
      def nbrs(v: Long) = adj.getOrElse(v, scala.collection.mutable.HashSet.empty[Long])
      pairs.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a }
      def supIn(a: Long, b: Long, in: E => Boolean): Int = {
        val (sa, sb) = (nbrs(a), nbrs(b))
        val (small, big, x, y) = if (sa.size <= sb.size) (sa, sb, a, b)
          else (sb, sa, b, a)
        small.count(c => big.contains(c) && in(key(x, c)) && in(key(y, c)))
      }
      val inU2 = pairs.map { case (a, b) => key(a, b) }.toSet
      // P1 = one-round-peeled v2 (membership test, computed lazily)
      val p1 = scala.collection.mutable.HashMap.empty[E, Boolean]
      def inP1(e: E): Boolean = p1.getOrElseUpdate(e,
        inU2(e) && supIn(e._1, e._2, inU2) >= k - 2)
      // candidate region: triangle-adjacency BFS from inserted P1 edges
      // through non-core P1 edges
      val region = scala.collection.mutable.LinkedHashSet.empty[E]
      val bfs = scala.collection.mutable.Queue.empty[E]
      insP.foreach { case (a, b) => val e = key(a, b)
        if (!coreSup.contains(e) && inP1(e) && region.add(e)) bfs += e }
      while (bfs.nonEmpty) {
        val (a, b) = bfs.dequeue()
        nbrs(a).foreach { c =>
          if (nbrs(b).contains(c) && inP1(key(a, c)) && inP1(key(b, c))) {
            Seq(key(a, c), key(b, c)).foreach { e =>
              if (!coreSup.contains(e) && inP1(e) && region.add(e)) bfs += e }
          }
        }
      }
      require(region.size <= math.max(10000L, 20L * insN),
        s"incrementalKTruss: candidate region (${region.size} edges) " +
          s"degenerated past 20x the inserted-edge delta ($insN) — " +
          "maintenance would not be delta-scoped; recompute from the new snapshot")
      // frozen-core Kahn peel: support within core ∪ survivors
      val live = scala.collection.mutable.HashMap.empty[E, Boolean]
      def inScope(e: E): Boolean =
        (coreSup.contains(e) && inU2(e)) || live.getOrElse(e, false)
      region.foreach(e => live(e) = true)
      // NOTE: core edges DELETED in v2 must not support candidates —
      // inU2 guards that above (kBase later drops them too)
      val supS = scala.collection.mutable.HashMap.empty[E, Int]
      region.foreach(e => supS(e) = supIn(e._1, e._2, inScope))
      // Kahn discipline: an edge is marked removed at DEQUEUE (pop)
      // time, never at enqueue — a queued-but-unpopped co-edge still
      // counts as live, so every destroyed triangle is subtracted from
      // its third edge exactly once (two seeds sharing a triangle used
      // to each see the other "already dead" and skip the subtraction,
      // letting an exactly-at-threshold third edge wrongly survive with
      // stale support). `queuedS` only dedupes enqueues.
      val dead = scala.collection.mutable.Queue.empty[E]
      val queuedS = scala.collection.mutable.HashSet.empty[E]
      region.foreach(e => if (supS(e) < k - 2) { queuedS += e; dead += e })
      while (dead.nonEmpty) {
        val e0 = dead.dequeue()
        live(e0) = false
        val (a, b) = e0
        nbrs(a).foreach { c =>
          if (nbrs(b).contains(c)) {
            val (e1, e2) = (key(a, c), key(b, c))
            if (inScope(e1) && inScope(e2)) {
              Seq(e1, e2).foreach { e =>
                if (live.getOrElse(e, false)) {
                  supS(e) -= 1
                  if (supS(e) < k - 2 && queuedS.add(e)) dead += e
                }
              }
            }
          }
        }
      }
      val joiners = region.filter(e => live.getOrElse(e, false))
      // eviction Kahn over kBase = (core ∩ v2) ∪ joiners: recompute
      // in-base supports, evict below threshold, decrement co-edges
      val inBase = scala.collection.mutable.HashMap.empty[E, Boolean]
      coreSup.keysIterator.foreach(e => if (inU2(e)) inBase(e) = true)
      joiners.foreach(e => inBase(e) = true)
      def inB(e: E): Boolean = inBase.getOrElse(e, false)
      val supB = scala.collection.mutable.HashMap.empty[E, Int]
      val baseKeys = inBase.keys.toArray // snapshot: no iteration over a map being written
      baseKeys.foreach(e => supB(e) = supIn(e._1, e._2, inB))
      // Same pop-time-removal discipline as the candidate peel above:
      // removal flips at dequeue so a queued co-edge still supports its
      // triangles until popped; the both-live guard then subtracts each
      // destroyed triangle from the third edge exactly once (a triangle
      // whose other co-edge was POPPED earlier was already subtracted
      // at that pop — the double-decrement guard).
      val evQ = scala.collection.mutable.Queue.empty[E]
      val queuedB = scala.collection.mutable.HashSet.empty[E]
      baseKeys.foreach(e =>
        if (supB(e) < k - 2) { queuedB += e; evQ += e })
      while (evQ.nonEmpty) {
        val e0 = evQ.dequeue()
        inBase(e0) = false
        val (a, b) = e0
        nbrs(a).foreach { c =>
          if (nbrs(b).contains(c)) {
            val (e1, e2) = (key(a, c), key(b, c))
            if (inB(e1) && inB(e2)) {
              Seq(e1, e2).foreach { e =>
                supB(e) -= 1
                if (supB(e) < k - 2 && queuedB.add(e)) evQ += e
              }
            }
          }
        }
      }
      val rows = inBase.iterator.collect { case (e, true) =>
        (e._1, e._2, supB(e).toLong) }.toSeq
      trace(f"incrementalKTruss driver-solved u2N=$u2N region=${region.size} " +
        f"joiners=${joiners.size} truss=${rows.size} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      return rows.toDF("a", "b", "support").repartition(1).localCheckpoint(true)
    }
    val core = prevTruss.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"),
      col("support").cast("long").as("support")).localCheckpoint(true)
    val coreE = core.select("a", "b")
    def symOf(e: DataFrame): DataFrame =
      e.select(col("a").as("v"), col("b").as("w"))
        .union(e.select(col("b").as("v"), col("a").as("w")))
    val sym2full = symOf(u2).localCheckpoint(true)
    // Candidate UNIVERSE = the one-round-peeled v2 (edges whose full-v2
    // support is ≥ k−2), built ONCE with the peel's own unhinted wedge
    // join: "full-v2 support ≥ k−2" alone admits chains of exactly-
    // critical edges that the peel's round 2 kills (measured: the
    // strip+clique fixture's +1 strip edges all have raw support exactly
    // k−2, so the raw filter walked the candidate region down the ENTIRE
    // strip, one wave per edge — a region ∝ graph, not delta). Every
    // true joiner lies in T2 ⊆ P1 and its supporting triangles lie
    // within T2 ⊆ P1, so drawing candidates, wedges, and support counts
    // from P1 loses nothing.
    val p1 = u2.as("u")
      .join(sym2full.as("x"), col("x.v") === col("u.a"))
      .join(sym2full.as("y"), col("y.v") === col("u.b") && col("y.w") === col("x.w"))
      .groupBy(col("u.a").as("a"), col("u.b").as("b"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= k - 2).select("a", "b")
      .localCheckpoint(true)
    val sym2 = symOf(p1).localCheckpoint(true) // candidate-universe wedges
    def ckpt(df: DataFrame): DataFrame = df.repartition(1).localCheckpoint(true)
    var cumGated = 0L
    def small(df: DataFrame): DataFrame =
      if (cumGated <= 200000L) broadcast(df) else df
    // triangle support of a (checkpointed, counted) edge set `w` with
    // wedges drawn from `liveSym` — one scan of liveSym per leg against
    // the broadcast probe, probe-sized result
    def supIn(w: DataFrame, liveSym: DataFrame): DataFrame =
      small(w.select(col("a"), col("b"))).as("u")
        .join(liveSym.as("x"), col("x.v") === col("u.a"))
        .join(liveSym.as("y"), col("y.v") === col("u.b") && col("y.w") === col("x.w"))
        .groupBy(col("u.a").as("a"), col("u.b").as("b"))
        .agg(count(lit(1)).as("sup"))
    // edges sharing a v2-triangle with an edge of `f`: for (a,b) ∈ f and
    // common neighbor c, the co-edges (a,c) and (b,c), canonicalized
    def triNbr(f: DataFrame): DataFrame = {
      val wedges = small(f.select(col("a"), col("b"))).as("u")
        .join(sym2.as("x"), col("x.v") === col("u.a"))
        .join(sym2.as("y"), col("y.v") === col("u.b") && col("y.w") === col("x.w"))
        .select(col("u.a").as("a"), col("u.b").as("b"), col("x.w").as("c"))
      wedges.select(least(col("a"), col("c")).as("a"),
          greatest(col("a"), col("c")).as("b"))
        .union(wedges.select(least(col("b"), col("c")).as("a"),
          greatest(col("b"), col("c")).as("b")))
        .distinct()
    }
    def exceptE(x: DataFrame, y: DataFrame) = x.join(
      small(y.select(col("a").as("xa"), col("b").as("xb"))),
      col("a") === col("xa") && col("b") === col("xb"), "left_anti")

    // ---- insert side: triangle-adjacency candidate waves, then a
    // frozen-core peel against truss ∪ survivors
    val seed0 = ckpt(insE.join(p1.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_semi"))
    cumGated += seed0.count()
    def fullOk(w: DataFrame): DataFrame = {
      val s = supIn(w, sym2).filter(col("sup") >= k - 2).select("a", "b")
      w.join(s.select(col("a").as("xa"), col("b").as("xb")),
        col("a") === col("xa") && col("b") === col("xb"), "left_semi")
    }
    var frontier = ckpt(fullOk(seed0))
    var fn = frontier.count(); cumGated += fn
    var pFrames = List(frontier)
    def pAll: DataFrame = pFrames.reduce(_ union _)
    var waves = 0
    while (fn > 0 && waves < maxWaves) {
      waves += 1
      val nbrs = ckpt(exceptE(exceptE(
        triNbr(frontier).join(p1.select(col("a").as("xa"), col("b").as("xb")),
          col("a") === col("xa") && col("b") === col("xb"), "left_semi"),
        coreE), ckpt(pAll)))
      cumGated += nbrs.count()
      frontier = ckpt(fullOk(nbrs))
      fn = frontier.count(); cumGated += fn
      pFrames ::= frontier
    }
    require(fn == 0,
      s"incrementalKTruss: candidate region still growing after $maxWaves " +
        "waves — raise maxWaves or recompute from the new snapshot")
    val cand = ckpt(pAll)
    val candN = cand.count(); cumGated += candN
    require(candN <= math.max(10000L, 20L * insN),
      s"incrementalKTruss: candidate region ($candN edges) degenerated " +
        s"past 20x the inserted-edge delta ($insN) — maintenance would " +
        "not be delta-scoped; recompute from the new snapshot")
    var surv = cand
    var sn = candN
    var peelRounds = 0
    var stable = sn == 0L
    while (!stable && peelRounds < maxWaves) {
      peelRounds += 1
      val liveSym = symOf(coreE).union(symOf(surv))
      val keep = supIn(surv, liveSym).filter(col("sup") >= k - 2)
      val next = ckpt(surv.join(
        keep.select(col("a").as("xa"), col("b").as("xb")),
        col("a") === col("xa") && col("b") === col("xb"), "left_semi"))
      val nn = next.count(); cumGated += nn
      stable = nn == sn
      surv = next; sn = nn
    }
    require(stable,
      s"incrementalKTruss: candidate peel did not stabilize in $maxWaves " +
        "rounds — raise maxWaves or recompute from the new snapshot")
    val joiners = surv // checkpointed, counted (sn)

    // ---- delete side: eviction cascade over (truss ∖ deleted) ∪ joiners
    val kBase = ckpt(exceptE(coreE, delE).unionByName(joiners))
    cumGated += kBase.count()
    val kBaseSym = symOf(kBase).localCheckpoint(true)
    var evFrames = List.empty[DataFrame]
    val emptyE = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    def evictedAll: DataFrame = (emptyE :: evFrames).reduce(_ union _)
    // in-truss support with evicted edges masked out of the wedge frame
    def supLive(w: DataFrame, evicted: DataFrame): DataFrame = {
      val evSym = symOf(evicted)
      val liveSym = kBaseSym.join(
        small(evSym.select(col("v").as("xv"), col("w").as("xw"))),
        col("v") === col("xv") && col("w") === col("xw"), "left_anti")
      supIn(w, liveSym)
    }
    // wave 0: surviving co-triangle edges (in the OLD truss) of deleted
    // truss edges — the triangles the deletion destroyed
    val delCore = ckpt(delE.join(
      coreE.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_semi"))
    cumGated += delCore.count()
    // co-triangle edges within the OLD truss (prev snapshot's wedges —
    // the triangles whose loss the stored supports have not seen)
    val coreSym = symOf(coreE).localCheckpoint(true)
    def triNbrIn(f: DataFrame, liveSym: DataFrame): DataFrame = {
      val wedges = small(f.select(col("a"), col("b"))).as("u")
        .join(liveSym.as("x"), col("x.v") === col("u.a"))
        .join(liveSym.as("y"), col("y.v") === col("u.b") && col("y.w") === col("x.w"))
        .select(col("u.a").as("a"), col("u.b").as("b"), col("x.w").as("c"))
      wedges.select(least(col("a"), col("c")).as("a"),
          greatest(col("a"), col("c")).as("b"))
        .union(wedges.select(least(col("b"), col("c")).as("a"),
          greatest(col("b"), col("c")).as("b")))
        .distinct()
    }
    // wedges drawn from truss ∪ joiners — the support-bearing universe at
    // the time the stored/joiner supports were computed: a JOINER that
    // leaned on a triangle through a soon-deleted core edge must be
    // re-checked too, and its wedge legs are not in coreSym
    val preSym = coreSym.union(symOf(joiners)).localCheckpoint(true)
    var affected = ckpt(triNbrIn(delCore, preSym)
      .join(kBase.select(col("a").as("xa"), col("b").as("xb")),
        col("a") === col("xa") && col("b") === col("xb"), "left_semi"))
    var an = affected.count(); cumGated += an
    var evWaves = 0
    while (an > 0 && evWaves < maxWaves) {
      evWaves += 1
      val ev0 = ckpt(evictedAll)
      cumGated += ev0.count()
      val sup = supLive(affected, ev0)
      val evictNow = ckpt(exceptE(affected
        .join(sup.select(col("a").as("xa"), col("b").as("xb"),
          col("sup")), col("a") === col("xa") && col("b") === col("xb"), "left")
        .filter(coalesce(col("sup"), lit(0L)) < k - 2)
        .select("a", "b"), ev0))
      val en = evictNow.count(); cumGated += en
      if (en == 0) { an = 0 }
      else {
        evFrames ::= evictNow
        val ev1 = ckpt(evictedAll)
        cumGated += ev1.count()
        affected = ckpt(exceptE(triNbrIn(evictNow, kBaseSym)
          .join(kBase.select(col("a").as("xa"), col("b").as("xb")),
            col("a") === col("xa") && col("b") === col("xb"), "left_semi"),
          ev1))
        an = affected.count(); cumGated += an
      }
    }
    require(an == 0,
      s"incrementalKTruss: eviction cascade still live after $maxWaves " +
        "waves — raise maxWaves or recompute from the new snapshot")
    val evicted = ckpt(evictedAll)
    cumGated += evicted.count()

    // ---- readout: recompute support ONLY where the triangle set
    // changed; reuse every other stored support verbatim
    val kFinal = ckpt(exceptE(kBase, evicted))
    cumGated += kFinal.count()
    val removed = ckpt(delCore.unionByName(evicted))
    cumGated += removed.count()
    val kFinalSym = symOf(kFinal).localCheckpoint(true)
    val touched = ckpt(
      triNbrIn(removed, coreSym) // triangles LOST lived in the old truss
        .unionByName(triNbrIn(joiners, kFinalSym)) // triangles GAINED
        .unionByName(joiners)
        .distinct()
        .join(kFinal.select(col("a").as("xa"), col("b").as("xb")),
          col("a") === col("xa") && col("b") === col("xb"), "left_semi"))
    cumGated += touched.count()
    val supTouched = supIn(touched, kFinalSym)
      .select(col("a"), col("b"), col("sup").as("support"))
    val untouched = core
      .join(small(touched.select(col("a").as("xa"), col("b").as("xb"))),
        col("a") === col("xa") && col("b") === col("xb"), "left_anti")
      .join(small(evicted.select(col("a").as("xa"), col("b").as("xb"))),
        col("a") === col("xa") && col("b") === col("xb"), "left_anti")
      .join(small(delE.select(col("a").as("xa"), col("b").as("xb"))),
        col("a") === col("xa") && col("b") === col("xb"), "left_anti")
      .select(col("a"), col("b"), col("support"))
    untouched.unionByName(supTouched)
  }

  /** Local clustering coefficient over RAW directed edges (self-loops
    * dropped, duplicates collapsed at the undirected level): per vertex,
    * undirected degree, triangle count (canonical a<b<c wedge+closure
    * join, each triangle once), and lcc·1e6 in exact integer arithmetic
    * (2·tri·1e6 div deg·(deg−1)). Extracted from q_graph_lcc so the
    * query, the incremental maintainers' stored-state builders, and the
    * spec share one spelling. Returns `(v, deg, tri, lcc_e6)`. */
  def lcc(spark: SparkSession, rawEdges: DataFrame): DataFrame = {
    val und = rawEdges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val wedges = und.as("x").join(und.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
    val tris = wedges.join(und.select(col("a").as("ca"), col("b").as("cb")),
        col("a") === col("ca") && col("c") === col("cb"), "inner")
      .select("a", "b", "c")
    val perVertex = tris.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(perVertex, Seq("v"), "left").na.fill(0L, Seq("tri"))
      .select(col("v"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr("tri * 2000000 div (deg * (deg - 1))")).otherwise(0L).as("lcc_e6"))
  }

  /** INCREMENTAL local-clustering-coefficient maintenance over a
    * two-sided raw-edge diff — the PURELY LOCAL member of the
    * delete-bearing family: a vertex's (deg, tri) pair changes only when
    * an incident edge changes or a triangle through it is created or
    * destroyed, so maintenance is exact arithmetic on the delta's
    * neighborhood with NO cascade at all (work ∝ |delta| × degree,
    * never the graph, and zero iterative barriers):
    *
    *  - Δdeg: ±1 per endpoint of each inserted/deleted undirected edge.
    *  - Δtri: triangles CREATED = distinct v2-triangles containing an
    *    inserted edge; triangles DESTROYED = distinct v1-triangles
    *    containing a deleted edge (the two sets are disjoint — a
    *    triangle with both an inserted and a deleted edge exists in
    *    neither version). Canonical sorted triples dedup a triangle
    *    discovered through two of its delta edges.
    *
    * Note the third corner: a created triangle {x,y,z} with inserted
    * edge (x,y) changes z's count though NEITHER of z's edges changed —
    * GraphSpec pins that the fixture exercises exactly this. Vertices
    * whose last edge is deleted drop out of the output, matching the
    * full recompute's edge-defined universe. Returns
    * `(v, deg, tri, lcc_e6)` in the q_graph_lcc spelling. */
  def incrementalLcc(spark: SparkSession, v1Raw: DataFrame,
      v2Raw: DataFrame, prevState: DataFrame): DataFrame = {
    def und(e: DataFrame) = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
    val u1 = und(v1Raw).localCheckpoint(true)
    val u2 = und(v2Raw).localCheckpoint(true)
    def minus(x: DataFrame, y: DataFrame) = x.join(
      y.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_anti")
    val insU = minus(u2, u1).repartition(1).localCheckpoint(true)
    val delU = minus(u1, u2).repartition(1).localCheckpoint(true)
    val insN = insU.count(); val delN = delU.count()
    def gated(df: DataFrame): DataFrame =
      if (insN + delN <= 200000L) broadcast(df) else df
    def symOf(e: DataFrame) = e.select(col("a").as("v"), col("b").as("w"))
      .union(e.select(col("b").as("v"), col("a").as("w")))
    // distinct canonical triangles of `undAll` containing a delta edge
    def touchedTris(delta: DataFrame, undAll: DataFrame): DataFrame = {
      val sym = symOf(undAll)
      gated(delta).as("d")
        .join(sym.as("x"), col("x.v") === col("d.a"))
        .join(sym.as("y"), col("y.v") === col("d.b") && col("y.w") === col("x.w"))
        .select(array_sort(array(col("d.a"), col("d.b"), col("x.w"))).as("t"))
        .select(col("t").getItem(0).as("t1"), col("t").getItem(1).as("t2"),
          col("t").getItem(2).as("t3"))
        .distinct()
    }
    def triDelta(tris: DataFrame, sign: Int): DataFrame = tris
      .select(explode(array(col("t1"), col("t2"), col("t3"))).as("v"))
      .groupBy("v").agg((count(lit(1)) * sign).as("dtri"))
    def degDelta(delta: DataFrame, sign: Int): DataFrame = delta
      .select(col("a").as("v")).union(delta.select(col("b").as("v")))
      .groupBy("v").agg((count(lit(1)) * sign).as("ddeg"))
    val dTri = triDelta(touchedTris(insU, u2), 1)
      .unionByName(triDelta(touchedTris(delU, u1), -1))
      .groupBy("v").agg(sum("dtri").as("dtri"))
      .repartition(1).localCheckpoint(true)
    val dDeg = degDelta(insU, 1).unionByName(degDelta(delU, -1))
      .groupBy("v").agg(sum("ddeg").as("ddeg"))
      .repartition(1).localCheckpoint(true)
    val st = prevState.select(col("v").cast("long").as("v"),
      col("deg").cast("long").as("deg"), col("tri").cast("long").as("tri"))
    st.join(gated(dDeg), Seq("v"), "full")
      .join(gated(dTri), Seq("v"), "left")
      .select(col("v"),
        (coalesce(col("deg"), lit(0L)) + coalesce(col("ddeg"), lit(0L))).as("deg"),
        (coalesce(col("tri"), lit(0L)) + coalesce(col("dtri"), lit(0L))).as("tri"))
      .filter(col("deg") > 0)
      .select(col("v"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr("tri * 2000000 div (deg * (deg - 1))")).otherwise(0L).as("lcc_e6"))
  }

  /** INCREMENTAL weighted-SSSP maintenance over INSERT-only edge deltas —
    * [[incrementalBfsLevels]] generalized to weighted label correction
    * (and the weighted member that completes the incremental family):
    * inserting edges can only LOWER shortest-path costs or reach new
    * vertices, so maintenance is a delta-seeded Bellman-Ford relaxation —
    * each inserted (u,w,wt) with known dist(u) proposes dist(u)+wt, and
    * improvements cascade along the full edge list with the same fused
    * two-hops-per-barrier discipline as [[sssp]]; work is sized by the
    * delta's cascade region, never the base graph. Exactness: previous
    * distances over-estimate the new graph's everywhere (edge insertion
    * is monotone), proposals are walk costs bounded below, and the
    * Bellman-Ford fixpoint is unique — equality with a full re-solve is
    * oracled end-to-end by q_graph_sssp_incremental. DELETIONS are out of
    * scope by design, loudly, as in the whole family: removing an edge
    * can RAISE costs, undecidable from (state, delta).
    */
  def incrementalSssp(spark: SparkSession, fullEdges: DataFrame,
      prevDist: DataFrame, inserted: DataFrame, maxIter: Int = 100): DataFrame = {
    val e = fullEdges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long")).persist()
    val state0 = prevDist.select(col("v").cast("long").as("v"),
      col("dist").cast("long").as("label"))
    // seed: relax ONLY the inserted edges against the previous state (an
    // inserted edge from a still-unreachable source contributes nothing
    // yet — a later cascade re-proposes it via the full edge list)
    val seed0 = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("tv"),
        col("w").cast("long").as("iw"))
      .join(state0.select(col("v").as("u"), col("label").as("ud")), Seq("u"))
      .groupBy(col("tv").as("v")).agg(min(col("ud") + col("iw")).as("cand"))
      .join(state0, Seq("v"), "left")
      .filter(col("label").isNull || col("cand") < col("label"))
      .select(col("v"), col("cand").as("label"))
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hd"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst"),
        col("w").as("hw")), col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg(min(col("hd") + col("hw")).as("label"))
    val out = labelCorrectLoop("incrementalSssp", state0, seed0, hop,
      min, _ < _, least(_, _), maxIter)
    e.unpersist()
    out.withColumnRenamed("label", "dist")
  }

  /** DELETION-aware incremental weighted-SSSP maintenance — the weighted
    * generalization of [[incrementalBfsLevelsDelete]] (BFS is the w ≡ 1
    * special case): a stored distance stays VALID iff its support chain
    * survives — a parent p with a surviving edge (p, w) of weight pw such
    * that dist(p) + pw = dist(w), p itself supported. The unsettled set
    * grows by the same delta-scoped waves (wave 0 = heads of deleted
    * edges whose last tight parent died; wave i+1 = tight children of
    * wave i with no tight parent left outside the set), settled distances
    * are valid upper bounds (their support chain IS a surviving path of
    * that cost), and one shared min-relaxation re-solves the unsettled
    * region while applying the inserted-edge improvements. Vertices no
    * surviving path reaches drop out. */
  def incrementalSsspDelete(spark: SparkSession, newEdges: DataFrame,
      prevDist: DataFrame, inserted: DataFrame, deleted: DataFrame,
      maxIter: Int = 100,
      cascadeDriverLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    val e = newEdges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    // The support-chain argument REQUIRES strictly positive weights: a
    // zero-weight cycle lets two equal-dist vertices mutually "support"
    // each other, so the wave cascade would never unsettle them and the
    // result silently keeps stale distances. Gate loudly (the
    // requireLcgPriorityDomain discipline); the one agg rides the
    // checkpoint just materialized.
    val minW = e.agg(min("w")).collect()(0)
    require(minW.isNullAt(0) || minW.getLong(0) > 0L,
      s"incrementalSsspDelete requires strictly positive weights " +
        s"(min = ${minW.getLong(0)}) - the tight-parent support cascade " +
        "is unsound under zero-weight cycles")
    val pv = prevDist.select(col("v").cast("long").as("v"),
      col("dist").cast("long").as("dist")).localCheckpoint(true)
    val unsettled = supportCascade(spark, e,
      pv.select(col("v"), col("dist").as("lab")),
      deleted.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w")),
      maxIter, "incrementalSsspDelete", cascadeDriverLimit)
    val state0 = pv.join(unsettled, Seq("v"), "left_anti")
      .select(col("v"), col("dist").as("label")).localCheckpoint(true)
    val seedBoundary = e
      .join(state0.select(col("v").as("src"), col("label").as("pd")), Seq("src"))
      .join(unsettled.select(col("v").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("dst").as("v")).agg(min(col("pd") + col("w")).as("label"))
    val seedIns = inserted
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("tv"),
        col("w").cast("long").as("iw"))
      .join(state0.select(col("v").as("u"), col("label").as("ud")), Seq("u"))
      .groupBy(col("tv").as("v")).agg(min(col("ud") + col("iw")).as("label"))
    val seed0 = seedBoundary.unionByName(seedIns)
      .groupBy("v").agg(min("label").as("label"))
      .join(state0.select(col("v"), col("label").as("cur")), Seq("v"), "left")
      .filter(col("cur").isNull || col("label") < col("cur"))
      .select("v", "label")
    def hop(fr: DataFrame): DataFrame = fr
      .select(col("v").as("hv"), col("label").as("hd"))
      .join(e.select(col("src").as("hsrc"), col("dst").as("hdst"),
        col("w").as("hw")), col("hv") === col("hsrc"))
      .groupBy(col("hdst").as("v"))
      .agg(min(col("hd") + col("hw")).as("label"))
    labelCorrectLoop("incrementalSsspDelete", state0, seed0, hop,
      min, _ < _, least(_, _), maxIter)
      .withColumnRenamed("label", "dist")
  }

  /** Bounded Borůvka rounds over a canonical undirected weighted edge set
    * `(a, b, w)` (a<b) — THE minimum-spanning-forest algorithm that fits
    * BSP execution (Kruskal needs a sequential union-find, Prim a
    * sequential frontier; Borůvka's per-round work is two vertex-keyed
    * joins + one per-component min + one contraction, all shuffle-
    * parallel, and the component count at least halves per round, so
    * O(log V) rounds finish the forest). Each round: every component
    * picks its minimum incident OUTGOING edge — deterministic via
    * lexicographic (w, a, b), so ties never make the choice engine- or
    * partition-order-dependent — the chosen edges join the forest, and
    * components contract through [[connectedComponents]] on the
    * component-level graph (chosen edges only — contraction input is one
    * edge per live component, never the full graph). Rounds are BOUNDED
    * (the fixed-unroll discipline of q_graph_kcore/labelprop, which is
    * what lets the DuckDB oracle replay the identical per-round choices);
    * run with `rounds ≥ log2(V)` to reach the complete forest, which
    * GraphSpec pins against in-memory Kruskal by total weight.
    * Returns (labels `(v, comp)` after the last round,
    * chosen `(round, a, b, w)` — the forest edges so far).
    */
  def boruvka(spark: SparkSession, und: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val e = und.select(col("a").cast("long"), col("b").cast("long"),
      col("w").cast("long")).localCheckpoint(true)
    var labels = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .distinct().withColumn("comp", col("v")).localCheckpoint(true)
    val chosenRounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val la = labels.select(col("v").as("a"), col("comp").as("ca"))
      val lb = labels.select(col("v").as("b"), col("comp").as("cb"))
      val outgoing = e.join(la, Seq("a")).join(lb, Seq("b"))
        .filter(col("ca") =!= col("cb"))
      // every edge is incident to BOTH endpoint components; min of the
      // (w, a, b, ...) struct is the deterministic per-component choice
      val pick = struct(col("w"), col("a"), col("b"), col("ca"), col("cb"))
      val chosen = outgoing
        .select(col("ca").as("comp"), pick.as("e"))
        .union(outgoing.select(col("cb").as("comp"), pick.as("e")))
        .groupBy("comp").agg(min("e").as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"), col("e.w").as("w"),
          col("e.ca").as("ca"), col("e.cb").as("cb"))
        .distinct().localCheckpoint(true)
      if (chosen.isEmpty) done = true
      else {
        chosenRounds += chosen.select(lit(r).as("round"), col("a"), col("b"), col("w"))
        // contract on the COMPONENT graph: |edges| = |chosen| ≤ live comps
        val ce = chosen.select(col("ca").as("src"), col("cb").as("dst"))
        val remap = connectedComponents(spark,
            ce.union(ce.select(col("dst").as("src"), col("src").as("dst"))))
          .select(col("v").as("comp"), col("comp").as("nc"))
        labels = labels.join(remap, Seq("comp"), "left")
          .select(col("v"), coalesce(col("nc"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
      r += 1
    }
    val chosen = chosenRounds.reduceOption(_ union _).getOrElse(
      e.sparkSession.emptyDataFrame
        .select(lit(0).as("round"), lit(0L).as("a"), lit(0L).as("b"), lit(0L).as("w"))
        .limit(0))
    (labels, chosen)
  }

  /** INCREMENTAL minimum-spanning-forest maintenance over a two-sided
    * weighted undirected diff — the contraction property of the unique
    * lexicographic-(w, a, b) MSF made a maintainer: with F = the stored
    * forest and D/I the deleted/inserted canonical edges,
    *
    *   MSF(G') = MSF( (F ∖ D)  ∪  I  ∪  X )
    *
    * where X = the v2 edges crossing two different FRAGMENTS (components
    * of F ∖ D). Proof shape: any other v2 edge is a non-forest v1 edge
    * inside one fragment, so its v1 forest path — every edge smaller
    * under the total order (cycle property) — survives intact and
    * excludes it from MSF(G') too; and the MSF of a subset that contains
    * MSF(G') and preserves per-component connectivity IS MSF(G')
    * (uniqueness under the lexicographic order). The candidate set is
    * V-scale (forest) + delta + cross-fragment edges — at 100 TB that is
    * the win: the full edge set is scanned ONCE (to find X, two label
    * joins), never fed to the O(log V)-round Borůvka. [[boruvka]] runs
    * to early-stop convergence on the candidates; uniqueness makes the
    * result algorithm-independent, so the full-recompute oracle compares
    * exactly. Returns the new forest `(a, b, w)`. */
  def incrementalMsf(spark: SparkSession, v2Und: DataFrame,
      prevForest: DataFrame, insUnd: DataFrame, delUnd: DataFrame,
      driverSolveLimit: Long = DriverSolveEdgeLimit): DataFrame = {
    import spark.implicits._
    def c(e: DataFrame) = e.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"), col("w").cast("long").as("w"))
    val u2 = c(v2Und).localCheckpoint(true)
    val u2N = u2.count()
    if (u2N <= driverSolveLimit) {
      // DRIVER SOLVE under the family's size gate (the kcore/ktruss/dag
      // precedent, r11 VERDICT #3): the candidate algebra is identical —
      // F' = F∖D fragments via union-find, X = v2 edges crossing two
      // fragments, candidates = F' ∪ I ∪ X — and the forest of the
      // candidate set is computed by Kruskal under the lexicographic
      // (w, a, b) total order. Uniqueness of the MSF under an injective
      // order makes Kruskal-on-candidates == Borůvka-on-candidates ==
      // MSF(G'), so the >gate Borůvka path and the full-recompute oracle
      // compare exactly (GraphSpec pins all three with the gate forced).
      val t0 = System.nanoTime()
      val u2Arr = u2.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val delK = delUnd.select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fPrimeArr = c(prevForest).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filterNot(e => delK((e._1, e._2)))
      val insArr = c(insUnd).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // fragment union-find over F∖D (vertices absent self-label)
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(v: Long): Long = {
        var root = v
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = v // path compression
        while (parent.getOrElse(cur, cur) != root) {
          val nxt = parent(cur); parent(cur) = root; cur = nxt
        }
        root
      }
      def union(a: Long, b: Long): Boolean = {
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) false else { parent(ra) = rb; true }
      }
      fPrimeArr.foreach(e => union(e._1, e._2))
      // candidates: F' ∪ I ∪ X, deduped by canonical key (w is keyed
      // by (a, b) — same edge, same weight)
      val cand = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      fPrimeArr.foreach(e => cand((e._1, e._2)) = e._3)
      insArr.foreach(e => cand((e._1, e._2)) = e._3)
      u2Arr.foreach { case (a, b, w) =>
        if (find(a) != find(b)) cand.getOrElseUpdate((a, b), w) }
      // Kruskal over the candidates under (w, a, b) — fresh union-find
      parent.clear()
      val rows = cand.iterator.map { case ((a, b), w) => (w, a, b) }.toArray
      java.util.Arrays.sort(rows, implicitly[Ordering[(Long, Long, Long)]])
      val forest = rows.iterator
        .filter { case (_, a, b) => union(a, b) }
        .map { case (w, a, b) => (a, b, w) }.toSeq
      trace(f"incrementalMsf driver-solved u2N=$u2N cand=${cand.size} " +
        f"forest=${forest.size} t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      return forest.toDF("a", "b", "w").repartition(1).localCheckpoint(true)
    }
    def keyAnti(x: DataFrame, y: DataFrame) = x.join(
      y.select(col("a").as("xa"), col("b").as("xb")),
      col("a") === col("xa") && col("b") === col("xb"), "left_anti")
    val fPrime = keyAnti(c(prevForest), delUnd).localCheckpoint(true)
    // fragment labels over the forest remnant (V-scale, size-gated CC);
    // vertices outside F∖D self-label — each is its own fragment
    val fSym = fPrime.select(col("a").as("src"), col("b").as("dst"))
      .union(fPrime.select(col("b").as("src"), col("a").as("dst")))
    val frag = connectedComponents(spark, fSym).localCheckpoint(true)
    val x = u2
      .join(frag.select(col("v").as("a"), col("comp").as("ca")), Seq("a"), "left")
      .join(frag.select(col("v").as("b"), col("comp").as("cb")), Seq("b"), "left")
      .filter(coalesce(col("ca"), col("a")) =!= coalesce(col("cb"), col("b")))
      .select("a", "b", "w")
    val cands = fPrime.unionByName(c(insUnd)).unionByName(x)
      .groupBy("a", "b").agg(min("w").as("w")) // dedup; w is keyed by (a,b)
    boruvka(spark, cands, 40)._2.select("a", "b", "w")
  }

  /** Distinct triangles that contain ≥1 inserted edge — the delta term of
    * INCREMENTAL triangle-count maintenance (the [[incrementalConnectedComponents]]
    * discipline applied to the motif family): every triangle of the new
    * snapshot either lies wholly in the old edge set (already counted by
    * the stored state) or contains at least one inserted canonical edge,
    * so `new_total = prev_total + count(triangleDelta)` exactly. Each
    * inserted edge (a,b) probes the FULL symmetric adjacency for common
    * neighbors — two joins keyed on vertex ids whose probe side is the
    * DELTA, so work is |delta| × avg-degree², never the base graph's
    * triangle enumeration — and triangles found through 2 or 3 of their
    * (new) edges collapse under the canonical-sort `distinct()`, which is
    * what makes the count exact rather than inclusion-exclusion-corrected.
    * Inputs are CANONICAL undirected edges (a<b, deduped — the
    * q_graph_triangles convention); `insertedUnd` must be canonical edges
    * present in `fullUnd` but absent from the previous snapshot's
    * canonical set (a directed insert whose reverse already existed is NOT
    * a new canonical edge and must be diffed out by the caller).
    *
    * DELETIONS are out of scope by design, loudly: a removed edge
    * destroys every triangle through it, which is the same delta-probe
    * shape, but the caller's stored per-triangle state could double-count
    * a triangle losing 2 edges in one diff — a deletion-bearing diff must
    * recompute (or apply the symmetric subtract with its own distinct).
    * Returns one row per new triangle, canonical `(a, b, c)` with a<b<c.
    */
  def triangleDelta(fullUnd: DataFrame, insertedUnd: DataFrame): DataFrame = {
    val sym = fullUnd.select(col("a").as("v"), col("b").as("w"))
      .union(fullUnd.select(col("b").as("v"), col("a").as("w")))
    // common neighbors of the inserted edge's endpoints, then canonicalize
    val tri = insertedUnd.as("d")
      .join(sym.as("x"), col("x.v") === col("d.a"))
      .join(sym.as("y"), col("y.v") === col("d.b") && col("y.w") === col("x.w"))
      .select(col("d.a").as("ea"), col("d.b").as("eb"), col("x.w").as("ew"))
    tri.select(
        least(col("ea"), col("eb"), col("ew")).as("a"),
        expr("ea + eb + ew").minus(
          least(col("ea"), col("eb"), col("ew")) +
          greatest(col("ea"), col("eb"), col("ew"))).as("b"),
        greatest(col("ea"), col("eb"), col("ew")).as("c"))
      .distinct()
  }
}
