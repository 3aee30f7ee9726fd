package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link analysis over edge DataFrames — the graph-shaped
  * complement of [[Dedup.clusters]]' connected components: CC answers
  * "which docs are the same thing", PageRank answers "which nodes
  * matter", the canonical-document / crawl-frontier prioritization
  * signal (Page et al. 1999).
  *
  * All arithmetic is exact integer fixed point (ppm), so ranks are
  * bit-identical across engines, partitionings, and retry orders — the
  * same cross-engine determinism contract as the scored queries. The
  * recurrence (damping d in ppm):
  *
  * {{{
  *   contrib(u)  = r_k(u) div outdeg(u)            // exact integer div
  *   s(v)        = Σ contrib(u) over edges u→v     // exact integer sum
  *   r_{k+1}(v)  = (10^6 − d) + (d · s(v)) div 10^6
  * }}}
  *
  * Dangling nodes (no out-edges) simply contribute nothing — their mass
  * is not redistributed. Ranks therefore need not sum to n·10^6; the
  * ORDERING (what callers consume) is the standard damped walk's.
  *
  * Scale shape: one `distinct` of the edge list and one out-degree
  * aggregate up front (cached — reused every round), then per iteration
  * exactly one join of edges⋈ranks on `src` followed by one groupBy on
  * `dst` — the textbook Spark PageRank schedule. Rank tables carry two
  * longs per node; nothing driver-side ever scales with the graph.
  * Each round is `localCheckpoint`ed and the superseded round's blocks
  * are released immediately ([[Checkpoints.release]]), so lineage depth
  * and pinned storage are both FLAT in `iters` — deep power iterations
  * cost iterations, not memory or analyzer time.
  */
object Graph {

  /** Fixed-point PageRank (see object doc). Returns `(node, rank_ppm)`.
    *
    * Stays a LAZY plan under adaptive execution — deliberately NOT given
    * [[hitsPpm]]'s non-adaptive window: the shallow path here is ONE
    * single-consumer chain (join → agg → join per round) that AQE's
    * runtime coalescing measurably helps (sf0.1 / 32 cores: 1.19 s
    * adaptive vs 1.51 s fixed-plan), where HITS's two-consumers-per-round
    * structure pays replan latency instead. Measured, not guessed — the
    * two ops encode opposite policies because the numbers are opposite.
    *
    * Cache lifetime is CALLER-MANAGED (same contract as
    * [[graft.ops.Dedup.prefixFilterJoin]]): the returned plan references
    * the cached edge / degree-annotated-edge / node tables, which cannot
    * be unpersisted here without recomputing them once per power
    * iteration. After materializing the result, release them with
    * `spark.catalog.clearCache()` plus an RDD sweep
    * (`sc.getPersistentRDDs.values.foreach(_.unpersist(false))` — the
    * final round's localCheckpoint blocks are RDD-level and invisible to
    * `clearCache`; Bench does both per query).
    *
    * Checkpoint policy: shallow runs (`iters` ≤ [[lazyIterMax]], the
    * ranking-typical 3–10 minus margin) build ONE lazy DAG — each round
    * has exactly one consumer so the chain needs no pins, and the whole
    * run is a single action with zero driver sync; the only cost is a
    * linearly deeper plan. Deep runs checkpoint each round and release
    * the superseded one immediately ([[Checkpoints.release]]) — pinned
    * blocks and lineage stay FLAT in `iters` at the cost of one
    * materializing job per round (~0.3 s of driver sync per round at
    * micro scale; at 100 iterations the lazy plan's analyzer cost and
    * stage count grow without bound, which is the wrong trade everywhere
    * it matters). Override with `eagerCheckpoint`.
    *
    * @param edges      directed edge list; duplicates collapse
    * @param iters      power-iteration rounds (ranking stabilizes in
    *                   3–10; exact convergence is not the point of an
    *                   importance ORDERING)
    * @param dampingPpm damping factor in ppm (850000 = the classic 0.85)
    * @param eagerCheckpoint force per-round checkpoint+release (`true`)
    *                   or the lazy single-DAG (`false`); default picks by
    *                   `iters`
    */
  def pageRankPpm(edges: DataFrame, iters: Int, srcCol: String = "src",
                  dstCol: String = "dst", dampingPpm: Long = 850000L,
                  eagerCheckpoint: Option[Boolean] = None): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters must be in [0, 100], got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm must be in [0, 10^6], got $dampingPpm")
    val eager = eagerCheckpoint.getOrElse(iters > lazyIterMax)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().transform(Caching.cached)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // degree-annotated edge list, joined ONCE and cached — every power
    // iteration would otherwise redo the e⋈deg shuffle before touching
    // the ranks of that round
    val ed = e.join(deg, "src").transform(Caching.cached)
    // The node table carries a has-in-edges flag computed by the SAME
    // aggregation that deduplicates it (max over a 0/1 marker — one
    // exchange, exactly like the plain distinct): nodes with NO in-edges
    // never receive a contribution, so from round 1 on their rank is
    // exactly `base` (s(v) = 0). `sums` below covers precisely the
    // distinct-dst set (every node carries a rank each round, so every
    // in-edge produces a contribution row), so the per-round
    // `nodes ⋈ sums` LEFT join — an exchange + join PER ITERATION — is
    // equivalent to a shuffle-free UNION with the static no-in-edge
    // slice of this one cached table (r14, guide §2.4).
    // one pass over the cached edge table (explode), not a two-branch
    // union that reads the cache twice (r14: the union form ran 64 tasks
    // reading 2x the edge cache; this is 32 tasks reading it once)
    val nodesFlagged = e
      .select(explode(array(
        struct(col("src").as("node"), lit(0).as("_in")),
        struct(col("dst").as("node"), lit(1).as("_in")))).as("_ns"))
      .select(col("_ns.node").as("node"), col("_ns._in").as("_in"))
      .groupBy("node").agg(max(col("_in")).as("_in"))
      .transform(Caching.cached)
    val nodes = nodesFlagged.select("node")
    val base = 1000000L - dampingPpm
    val noInRanked = nodesFlagged.where(col("_in") === 0)
      .select(col("node"), lit(base).as("rank_ppm"))
    var ranks = nodes.withColumn("rank_ppm", lit(1000000L))
    // previous round's checkpoint — released once the next round has
    // materialized (its only reader), keeping pinned blocks flat in iters
    var prevCkpt: DataFrame = null
    for (_ <- 1 to iters) {
      // accumulation widened to decimal(38,0) (the oracle's HUGEINT): a
      // hub with 10^9+ in-links pushes Σ contrib — and the ×damping
      // product on it — past a long, and ranks themselves grow with
      // in-degree round over round; a wrapped long would silently
      // diverge from the exact oracle at crawl-graph scale
      // SHUFFLE_HASH on the rank side: statically this joins as SMJ and
      // AQE runtime-converts it to a broadcast join — a driver collect +
      // single-threaded hash build of the NODE-SIZED rank table EVERY
      // iteration. The hash hint builds per-partition tables off the
      // rank shuffle instead: no driver round-trip per round, no sort of
      // the edge side, and the build stays bounded per partition as long
      // as shuffle partitions scale with the graph (the deployment
      // posture; same contract as q_spearman's rank probe).
      val sums = ed
        .join(ranks.select(col("node").as("src"), col("rank_ppm").as("r"))
          .hint("SHUFFLE_HASH"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("cast(r div deg as decimal(38,0))")).as("s"))
      val next = sums
        .selectExpr("node",
          s"""CAST($base + (CAST($dampingPpm AS DECIMAL(38,0))
             * s) div 1000000
             AS BIGINT) AS rank_ppm""")
        .unionByName(noInRanked)
      if (eager) {
        val ckpt = next.localCheckpoint(false)
        // one count job materializes the round (column pruning cannot
        // reach inside a LogicalRDD, so this computes + pins the full
        // table) and truncates lineage — the analyzer never sees more
        // than one round
        ckpt.count()
        if (prevCkpt != null) Checkpoints.release(prevCkpt)
        prevCkpt = ckpt
        ranks = ckpt
      } else {
        // lazy: each round has exactly ONE consumer (the next round, or
        // the final output), so the chain needs no pins at all — just a
        // linearly-growing DAG executed as a single action
        ranks = next
      }
    }
    ranks
  }

  /** Iteration count up to which the single-DAG lazy plan (round tables
    * pinned, zero driver sync) beats per-round checkpoint+release:
    * pins grow 2 longs/node/round, so a handful of rounds is cheaper
    * than paying a materializing job each — past it, dead pins dominate.
    */
  private val lazyIterMax = 4

  /** Fixed-point HITS hubs-and-authorities (Kleinberg, JACM 1999) — the
    * second classic link-analysis ordering: an *authority* is pointed to
    * by good hubs, a *hub* points to good authorities. On the corpus
    * graphs this library ranks (doc→doc citations, crawl link graphs,
    * customer→supplier style bipartite purchase graphs) it separates
    * "widely referenced" from "referencing widely" — two orderings
    * PageRank's single score conflates.
    *
    * Mutual recurrence per round, in exact integer ppm (max-normalized —
    * the standard HITS normalization made engine-exact: one scalar max
    * instead of an L2 norm, preserving the ordering):
    *
    * {{{
    *   araw(v) = Σ hub(u)  over edges u→v ; auth(v) = araw·10^6 div max(araw)
    *   hraw(u) = Σ auth(v) over edges u→v ; hub(u)  = hraw·10^6 div max(hraw)
    * }}}
    *
    * Scale shape: per round exactly one edges⋈hub join + groupBy(dst)
    * and one edges⋈auth join + groupBy(src) — the PageRank schedule run
    * in both directions. Unlike [[pageRankPpm]]'s chain, each raw table
    * here has TWO consumers (its normalizing max and the next join), so
    * every round must be pinned under both policies; what the crossover
    * ([[pageRankPpm]]'s, same `lazyIterMax`) picks is HOW:
    *
    *   - shallow/lazy: raw tables pinned via the cache manager, maxima
    *     as broadcast scalar joins — one action, zero driver sync;
    *     2·iters node-sized pins live until the caller's release sweep
    *     (plan-keyed: a re-run over the same edges re-hits them).
    *   - deep/eager: raw tables `localCheckpoint`ed, the normalizing max
    *     computed by the SAME job that materializes the checkpoint (a
    *     1-row driver scalar folded back as a literal — never a
    *     data-sized collect), superseded rounds released immediately —
    *     pinned storage and lineage depth flat in `iters`.
    *
    * Nodes with no in-edges read `auth_ppm = 0`, no out-edges
    * `hub_ppm = 0`.
    *
    * EXECUTES AT CALL TIME, inside a non-adaptive planning window
    * ([[FixedPlan.withAqeOff]] — the opposite policy from
    * [[pageRankPpm]], for the measured reasons documented there), and
    * returns the materialized checkpoint. The eager path's final-round
    * checkpoints are released here once the output is pinned (nothing
    * can re-hit a checkpoint); the lazy path's plan-keyed round pins and
    * the edge/node caches remain caller-managed as in [[pageRankPpm]].
    *
    * Returns `(node, hub_ppm, auth_ppm)`.
    */
  def hitsPpm(edges: DataFrame, iters: Int, srcCol: String = "src",
              dstCol: String = "dst",
              eagerCheckpoint: Option[Boolean] = None): DataFrame = {
    // ≤ 30: HITS orderings stabilize in well under 20 rounds; the eager
    // path keeps pinned storage flat in iters, so the cap just bounds
    // wasted compute, not memory
    require(iters >= 1 && iters <= 30, s"iters must be in [1, 30], got $iters")
    FixedPlan.withAqeOff(edges.sparkSession) {
    val eager = eagerCheckpoint.getOrElse(iters > lazyIterMax)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().transform(Caching.cached)
    // (the pagerank-style explode single-pass build was A/B'd here too
    // and LOST under this op's fixed non-adaptive plan — 3.40/4.65 vs
    // 3.25/4.09 across two matched windows; the two-branch union stays)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().transform(Caching.cached)
    var hub = nodes.select(col("node"), lit(1000000L).as("h"))
    // compile-time placeholder only: iters >= 1 guarantees the loop
    // assigns auth before anything reads it (authority has no defined
    // pre-iteration state in HITS)
    var auth = nodes.select(col("node"), lit(0L).as("a")).limit(0)
    // decimal(38,0) max as a literal column; an empty raw table (no
    // edges) yields a NULL max → NULL normalized scores over an empty
    // frame, which the final coalesce folds to 0 — same as before
    def scalarLit(r: org.apache.spark.sql.Row): org.apache.spark.sql.Column =
      (if (r.isNullAt(0)) lit(null) else lit(r.getDecimal(0))).cast("decimal(38,0)")
    var lastHraw: DataFrame = null
    var lastAraw: DataFrame = null
    for (i <- 1 to iters) {
      // each raw table MUST be pinned before reuse: unpinned, every
      // later iteration's plan embeds it twice more — the recompute
      // doubles per consumer and the plan tree grows exponentially in
      // `iters` (measured 16 s vs 0.8 s at two iterations, sf0.1). Two
      // longs per node either way; the eager path additionally releases
      // the superseded direction as soon as its last reader runs.
      val araw0 = e
        .join(hub.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("h").cast("decimal(38,0)")).as("ar"))
      // normalization widened to decimal(38,0): `ar` is bounded by
      // 10^6 × max in-degree, so the ×10^6 would overflow a long once a
      // node's in-degree passes ~9×10^6 — real at crawl-graph scale.
      // The oracle's HUGEINT sum mirrors the widening exactly. In the
      // eager path the max job doubles as the checkpoint materializer:
      // one scan computes and pins the table AND returns the scalar.
      val araw = if (eager) araw0.localCheckpoint(false)
                 else araw0.transform(Caching.cached)
      auth =
        if (eager) {
          val am = scalarLit(araw.agg(max(col("ar"))).collect()(0))
          // hub_{i-1}'s backing table had exactly one remaining reader —
          // the araw job that just ran
          if (lastHraw != null) Checkpoints.release(lastHraw)
          araw.withColumn("am", am)
            .selectExpr("node",
              "cast((cast(ar as decimal(38,0)) * 1000000) div am as bigint) as a")
        } else
          araw.crossJoin(broadcast(araw.agg(max(col("ar")).as("am"))))
            .selectExpr("node",
              "cast((cast(ar as decimal(38,0)) * 1000000) div am as bigint) as a")
      val hraw0 = e
        .join(auth.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("a").cast("decimal(38,0)")).as("hr"))
      val hraw = if (eager) hraw0.localCheckpoint(false)
                 else hraw0.transform(Caching.cached)
      hub =
        if (eager) {
          val hm = scalarLit(hraw.agg(max(col("hr"))).collect()(0))
          // auth_i's only reader was the hraw job — unless this is the
          // final round, where the output still projects from araw
          if (i < iters) Checkpoints.release(araw)
          hraw.withColumn("hm", hm)
            .selectExpr("node",
              "cast((cast(hr as decimal(38,0)) * 1000000) div hm as bigint) as h")
        } else
          hraw.crossJoin(broadcast(hraw.agg(max(col("hr")).as("hm"))))
            .selectExpr("node",
              "cast((cast(hr as decimal(38,0)) * 1000000) div hm as bigint) as h")
      lastHraw = hraw
      lastAraw = araw
    }
    // materialize INSIDE the fixed-plan window (see pageRankPpm). The
    // eager path's final-round checkpoints are released here — they are
    // not plan-keyed, so nothing can ever re-hit them. The lazy path's
    // cache-manager round pins stay (caller-managed, like e/nodes): a
    // re-run over the same edge frame re-hits them by plan equality.
    val out = nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub_ppm"),
        coalesce(col("a"), lit(0L)).as("auth_ppm"))
      .localCheckpoint()
    if (eager) {
      Checkpoints.release(lastAraw)
      Checkpoints.release(lastHraw)
    }
    out
    }
  }
}
