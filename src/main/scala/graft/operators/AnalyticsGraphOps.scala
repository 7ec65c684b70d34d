package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph / centrality operators over edge-list DataFrames.
  * Split from [[Analytics]] (round 15); member bodies are unchanged —
  * this trait is self-typed to and mixed back into the same object, so
  * every reference (the shelf's calls into core helpers like
  * `rankByRange`, and every external `Analytics.<member>` call site)
  * resolves exactly as before.
  */
private[graft] trait AnalyticsGraphOps { this: Analytics.type =>

  /** Fixed-point integer PageRank over a distinct edge list: `iters`
    * synchronous power-iteration rounds at damping `damping/1000`,
    * every quantity in exact 1e12 fixed-point units (`rank_scaled`) —
    * the per-mill damping split, the per-edge contribution
    * (`damping·rank div (1000·deg)`), and the teleport term are all
    * BIGINT arithmetic, so ranks are bit-identical across engines,
    * partitionings, and cluster sizes.
    *
    * DANGLING-MASS SEMANTICS: nodes with no out-edges contribute
    * NOTHING to the next round — their damped mass is dropped, not
    * redistributed, so total mass shrinks by `damping/1000 ×
    * (dangling mass + per-edge integer-division remainders)` each
    * iteration rather than staying at 1.0 (the standard alternative
    * adds the dangling sum uniformly). This is the right contract for
    * the registry's use (q154 symmetrizes the graph first, so no
    * dangling nodes exist and only the div remainders leak); callers
    * ranking a directed graph with sinks should symmetrize or accept
    * sink-discounted ranks. The per-iteration mass identity is pinned
    * by spec (AnalyticsSpec).
    *
    * Scale shape: the normalized edge list persists once,
    * repartitioned AND sorted on the join key, so each round's join
    * re-sorts only the rank side (node-count rows); per-round lineage
    * truncates via `localCheckpoint`. Per-iteration shuffle of the
    * contribution aggregate is inherent to PageRank.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 6, damping: Int = 850): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping >= 0 && damping <= 1000, "damping is per-mill")
    val scale = 1000000000000L // 1e12: fixed-point unit
    // the normalized edge list is consumed THREE times (degrees, the
    // persisted per-iteration join input, the node universe): persist
    // it first or the upstream plan — often a join + distinct over the
    // raw relation — re-executes once per consumer before the
    // iterations even start
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    // partition AND sort on the iteration join key before persisting:
    // the cached ordering is visible to the planner, so each round's
    // join re-sorts only the rank side (node-count rows), never the
    // edge list
    val edged = e.join(deg, Seq("__src"))
      .repartition(col("__src"))
      .sortWithinPartitions("__src")
      .transform(graft.core.CacheScope.disk)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = nodes.count()
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var ranks = nodes.select(col("node"),
      lit(scale / n).as("rank_scaled")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edged
        .join(ranks.select(col("node").as("__src"), col("rank_scaled")),
          Seq("__src"))
        .select(col("__dst").as("node"),
          expr(s"($damping * rank_scaled) div (1000 * __deg)")
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("__in"), lit(0L)))
            .as("rank_scaled"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank — [[pageRank]] with the teleport
    * restricted to a SEED set: instead of "globally important
    * nodes", the ranks answer "important *relative to these seeds*"
    * (random walks restart at the seeds, so mass concentrates in
    * their neighborhood) — the standard recommendation / related-
    * entity primitive: seed a user's purchases, read off the
    * co-purchase neighborhood by relevance.
    *
    * Exactness, the [[pageRank]] scheme verbatim: ranks live in 1e12
    * fixed-point units; seeds share the teleport mass by integral
    * division (`(1000−damping)·scale/1000 div nSeeds`, driver longs);
    * per-edge contributions are `(damping·rank) div (1000·deg)`
    * integral divisions summed order-free — every iteration is
    * BIGINT-exact and bit-identical cross-engine. Initial mass:
    * `scale div nSeeds` on each seed, 0 elsewhere.
    *
    * Scale shape identical to [[pageRank]]: the normalized edge list
    * persists once partitioned+sorted on the join key, each round is
    * one join + grouped sum + localCheckpoint; `seeds` (one `node`
    * column) is deduped and broadcast into the rank frame. Seeds
    * absent from the graph still receive their teleport share (they
    * hold mass and leak none — the honest reading when a seed has no
    * edges yet).
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int = 6, damping: Int = 850)
      : DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping >= 0 && damping <= 1000, "damping is per-mill")
    val scale = 1000000000000L
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val edged = e.join(deg, Seq("__src"))
      .repartition(col("__src"))
      .sortWithinPartitions("__src")
      .transform(graft.core.CacheScope.disk)
    val seedSet = seeds.select(col(seeds.columns.head).as("node"))
      .where(col("node").isNotNull).distinct()
      .transform(graft.core.CacheScope.disk)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .union(seedSet.select(col("node"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val nSeeds = seedSet.count()
    require(nSeeds >= 1, "need at least one seed node")
    val teleport = ((1000L - damping) * scale / 1000L) / nSeeds
    val seeded = nodes.join(
        broadcast(seedSet.withColumn("__isSeed", lit(true))),
        Seq("node"), "left")
      .withColumn("__isSeed",
        coalesce(col("__isSeed"), lit(false)))
      .transform(graft.core.CacheScope.disk)
    var ranks = seeded.select(col("node"),
      when(col("__isSeed"), lit(scale / nSeeds)).otherwise(lit(0L))
        .as("rank_scaled")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edged
        .join(ranks.select(col("node").as("__src"),
          col("rank_scaled")), Seq("__src"))
        .select(col("__dst").as("node"),
          expr(s"($damping * rank_scaled) div (1000 * __deg)")
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = seeded.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (when(col("__isSeed"), lit(teleport)).otherwise(lit(0L)) +
            coalesce(col("__in"), lit(0L))).as("rank_scaled"))
        .localCheckpoint()
    }
    ranks
  }

  /** Stationary distribution of a finite Markov chain by damped power
    * iteration — [[pageRank]] generalized to WEIGHTED transitions:
    * given transition counts `(from, to, cnt)` (e.g. a
    * [[transitionMatrix]] output), iterate
    * `π' = teleport + (damping/1000)·πᵀP` with P the row-normalized
    * count matrix. The "where does a user session settle" /
    * "long-run state mix" summary behind funnel and curriculum
    * audits.
    *
    * Exactness: π lives in 1e9 fixed-point units and each edge
    * probability is pre-quantized to `p = (cnt·1e9) div row_total`;
    * the per-edge update is `((damping·π) div 1000)·p div 1e9` —
    * every intermediate ≤ ~9·10¹⁷, inside BIGINT, so results are
    * bit-identical across engines and partitionings. Like
    * [[pageRank]], mass dropped by div floors and by ABSORBING states
    * (rows with no outgoing transitions) is NOT redistributed — total
    * mass shrinks accordingly; states reachable only as sinks still
    * receive teleport + inflow. Spec pins the replay identity.
    *
    * Scale: state spaces here are post-aggregation domains (event
    * types, funnel stages) — the transition frame is domain², tiny;
    * the iteration is `iters` broadcast-sized joins. For million-node
    * graphs use [[pageRank]]'s persisted-edge-list shape instead.
    */
  def markovStationary(
      trans: DataFrame, fromCol: String, toCol: String,
      cntCol: String, iters: Int = 8, damping: Int = 900): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    require(damping >= 0 && damping <= 1000, "damping is per-mill")
    val scale = 1000000000L // 1e9: see overflow note in the scaladoc
    val t = trans
      .select(col(fromCol).as("__f"), col(toCol).as("__t"),
        col(cntCol).cast("long").as("__n"))
      .where(col("__f").isNotNull && col("__t").isNotNull &&
        col("__n") > 0)
      .groupBy("__f", "__t").agg(sum(col("__n")).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val tot = t.groupBy("__f").agg(sum(col("__n")).as("__tot"))
    val edged = t.join(tot, Seq("__f"))
      .select(col("__f"), col("__t"),
        expr(s"(__n * $scale) div __tot").as("__p"))
      .transform(graft.core.CacheScope.disk)
    val states = t.select(col("__f").as("state"))
      .union(t.select(col("__t"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = states.count()
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var pi = states.select(col("state"),
      lit(scale / n).as("pi_scaled")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edged
        .join(pi.select(col("state").as("__f"), col("pi_scaled")),
          Seq("__f"))
        .select(col("__t").as("state"),
          expr(s"(($damping * pi_scaled) div 1000) * __p div $scale")
            .as("__c"))
        .groupBy("state").agg(sum(col("__c")).as("__in"))
      pi = states.join(contrib, Seq("state"), "left")
        .select(col("state"),
          (lit(teleport) + coalesce(col("__in"), lit(0L)))
            .as("pi_scaled"))
        .localCheckpoint()
    }
    pi
  }

  /** Markov removal-effect attribution over a conversion chain —
    * the model-based answer to "which channel actually drives
    * conversions" (Anderl et al. 2014's removal-effect reading of
    * first-order attribution, the standard alternative to
    * last-touch): for each channel c, re-run the chain with c's
    * OUTGOING traffic redirected to the dropout state (walkers
    * reaching c are lost; nothing else renormalizes) and price c by
    * how much conversion it takes with it. Channel attribution
    * shares are the normalized removal effects.
    *
    * Conversion probability is VALUE ITERATION truncated at `iters`
    * steps — v(s) = P(absorb in `convState` within `iters` hops
    * from s), v(conv) ≡ 1, v(drop) ≡ 0 — a deterministic,
    * engine-replayable contract (the within-K reading; geometric
    * convergence makes K = 12 indistinguishable from ∞ on session
    * chains, and BOTH engines compute the same K).
    *
    * Exactness, the [[markovStationary]] fixed-point scheme at MICRO
    * units: edge probabilities `p = (n·1e6) div row_total` (full
    * chain's totals — removal never renormalizes), each update
    * `v'(s) = (Σ p·v) div 1e6` an exact BIGINT identity (p·v ≤
    * 1e12, channel-domain fan-in keeps the sum far under 2⁶³), so
    * every v is bit-identical cross-engine; `effect_micro =
    * v_full(start) − v_c(start)` is an exact long and the emitted
    * ratios are ONE mirrored division each.
    *
    * Scale: the chain lives on the post-aggregation channel domain —
    * the variant expansion (one chain copy per removed channel) is a
    * domain-bounded cross join and the iteration is `iters` joins of
    * domain²-sized frames; nothing row-sized after the transition
    * count. Returns one row per channel:
    * `(channel, conv_micro_full, conv_micro_removed, effect_micro,
    * removal_effect, attribution)`.
    */
  def markovRemovalEffect(
      trans: DataFrame, fromCol: String, toCol: String,
      cntCol: String, startState: String, convState: String,
      dropState: String, iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 32, "iters in [1, 32]")
    val scale = 1000000L
    val t = trans
      .select(col(fromCol).as("__f"), col(toCol).as("__t"),
        col(cntCol).cast("long").as("__n"))
      .where(col("__f").isNotNull && col("__t").isNotNull &&
        col("__n") > 0)
      .groupBy("__f", "__t").agg(sum(col("__n")).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val tot = t.groupBy("__f").agg(sum(col("__n")).as("__tot"))
    val edges = t.join(tot, Seq("__f"))
      .select(col("__f"), col("__t"),
        expr(s"(__n * $scale) div __tot").as("__p"))
      .transform(graft.core.CacheScope.disk)
    val states = t.select(col("__f").as("state"))
      .union(t.select(col("__t"))).distinct()
      .transform(graft.core.CacheScope.disk)
    // variant domain: one removed-channel chain per channel, plus
    // the intact chain tagged __none (start/conv/drop are not
    // removable — they ARE the funnel)
    val variants = states
      .where(!col("state").isin(startState, convState, dropState))
      .select(col("state").as("__rm"))
      .union(states.limit(1).select(lit("__none").as("__rm")))
      .transform(graft.core.CacheScope.disk)
    val ve = broadcast(variants).crossJoin(edges)
      .where(col("__f") =!= col("__rm"))
      .transform(graft.core.CacheScope.disk)
    val vs = broadcast(variants).crossJoin(states)
      .transform(graft.core.CacheScope.disk)
    var v = vs.select(col("__rm"), col("state"),
      when(col("state") === convState, lit(scale)).otherwise(lit(0L))
        .as("__v")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = ve
        .join(v.select(col("__rm"), col("state").as("__t"),
          col("__v")), Seq("__rm", "__t"))
        .groupBy(col("__rm"), col("__f").as("state"))
        .agg(sum(expr("__p * __v")).as("__s"))
      v = vs.join(contrib, Seq("__rm", "state"), "left")
        .select(col("__rm"), col("state"),
          when(col("state") === convState, lit(scale))
            .when(col("state") === dropState, lit(0L))
            .otherwise(coalesce(expr(s"__s div $scale"), lit(0L)))
            .as("__v"))
        .localCheckpoint()
    }
    val atStart = v.where(col("state") === startState)
    // exactly one __none row exists; the no-grouping aggregate makes
    // the scalar shape PROVABLE to the plan gate (max of one value)
    val full = atStart.where(col("__rm") === "__none")
      .agg(max(col("__v")).as("__full"))
    val per = atStart.where(col("__rm") =!= "__none")
      .select(col("__rm").as("channel"),
        col("__v").as("conv_micro_removed"))
      .crossJoin(broadcast(full))
      .withColumn("effect_micro",
        col("__full") - col("conv_micro_removed"))
      .transform(graft.core.CacheScope.disk)
    val totEff = per.agg(sum(col("effect_micro")).as("__te"))
    per.crossJoin(broadcast(totEff))
      .select(col("channel"),
        col("__full").as("conv_micro_full"),
        col("conv_micro_removed"), col("effect_micro"),
        round(col("effect_micro").cast("double") /
          nullif(col("__full").cast("double"), lit(0.0)), 6)
          .as("removal_effect"),
        round(col("effect_micro").cast("double") /
          nullif(col("__te").cast("double"), lit(0.0)), 6)
          .as("attribution"))
  }

  /** Per-node triangle count and local clustering coefficient over an
    * UNDIRECTED simple graph given as an edge list (either direction;
    * duplicate / self edges tolerated and dropped).
    *
    * Scale shape — degree-ordered orientation (the standard
    * distributed triangle-counting transform; cf. the node-iterator++
    * scheme in Suri & Vassilvitskii, "Counting Triangles and the Curse
    * of the Last Reducer", WWW'11): canonicalize to `a < b` distinct
    * edges, compute degrees, then orient every edge from its lower
    * `(degree, id)` endpoint to the higher one. Wedges are enumerated
    * by self-joining the ORIENTED list on the source, so a hub of
    * degree d contributes `outdeg²` wedges with `outdeg = O(√E)` by
    * the orientation bound — the naive all-orientations join pays
    * `deg²` on every hub, which is the term that kills co-occurrence
    * graphs at scale (a part appearing in 10⁶ orders has deg ~10⁶).
    * Each triangle is produced exactly once (its corners appear in
    * `(deg, id)` order), then exploded back to the three corners for
    * the per-node counts — one aggregation, map-side combinable.
    *
    * Exactness: counts are exact longs; `coeff = 2·T(v) /
    * (deg(v)·(deg(v)−1))` is one division of two exact longs — the
    * same two longs give the same double in every engine.
    *
    * Returns `(node, degree, triangles, coeff)`, nodes of degree ≥ 1.
    */
  /** Degree assortativity (Newman 2002) of an undirected simple
    * graph: the Pearson correlation of endpoint degrees over every
    * directed edge — POSITIVE when hubs preferentially attach to
    * hubs (social-network shape: dedup clusters chain, communities
    * core up), NEGATIVE when hubs attach to leaves (hub-and-spoke:
    * star catalogs, basket graphs around popular staples). The one
    * scalar that says which failure mode a co-occurrence graph's
    * giant component will have BEFORE you run components on it —
    * disassortative graphs shatter under hub removal (degree caps
    * are safe), assortative ones percolate.
    *
    * Exactness: degrees are exact longs; both-direction edge rows
    * make Σx = Σy by construction but all five moments are computed
    * (squares/products in DECIMAL); r is one mirrored double
    * formula. Degenerate variance (regular graphs — every degree
    * equal) reports null.
    *
    * Scale: canonical distinct edges + one degree count, one
    * edge⋈degree join each side — all edge-domain-sized; the output
    * is ONE row per call.
    */
  def degreeAssortativity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    val und = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = und.select(col("__a").as("node"))
      .union(und.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .transform(graft.core.CacheScope.disk)
    val directed = und.union(
      und.select(col("__b").as("__a"), col("__a").as("__b")))
    val joined = directed
      .join(deg.select(col("node").as("__a"), col("degree").as("__dx")),
        Seq("__a"))
      .join(deg.select(col("node").as("__b"), col("degree").as("__dy")),
        Seq("__b"))
    val agg = joined.agg(
      count(lit(1)).as("m"),
      sum(col("__dx")).as("__sx"), sum(col("__dy")).as("__sy"),
      sum(dec(col("__dx")) * dec(col("__dy"))).as("__sxy"),
      sum(dec(col("__dx")) * dec(col("__dx"))).as("__sxx"),
      sum(dec(col("__dy")) * dec(col("__dy"))).as("__syy"))
    val mD = col("m").cast("decimal(38,0)")
    val num = (mD * col("__sxy") - dec(col("__sx")) * dec(col("__sy")))
      .cast("double")
    val vx = (mD * col("__sxx") - dec(col("__sx")) * dec(col("__sx")))
      .cast("double")
    val vy = (mD * col("__syy") - dec(col("__sy")) * dec(col("__sy")))
      .cast("double")
    val r = num / sqrt(vx * vy)
    val nNodes = deg.count()
    val ok = col("m") > 0L && vx > 0.0 && vy > 0.0
    agg.select(
      lit(nNodes).as("n_nodes"),
      (col("m") / 2L).cast("long").as("n_edges"),
      round(when(ok, r).otherwise(lit(null).cast("double")), 6)
        .as("assortativity"))
  }

  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    // canonical undirected edge set: consumed by degrees AND the
    // orientation join — persist or the upstream pair generator (often
    // a self-join on a fact table) re-executes per consumer
    val und = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = und.select(col("__a").as("node"))
      .union(und.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .transform(graft.core.CacheScope.disk)
    // orient: src = endpoint with the smaller (degree, id); carry the
    // destination's (degree, id) so the wedge join can order the two
    // far endpoints without re-joining degrees
    val withDeg = und
      .join(deg.select(col("node").as("__a"), col("degree").as("__da")),
        Seq("__a"))
      .join(deg.select(col("node").as("__b"), col("degree").as("__db")),
        Seq("__b"))
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    val oriented = withDeg.select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("__s"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("__d"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dd"))
      .transform(graft.core.CacheScope.disk)
    // wedges at s: far endpoints ordered by the SAME (degree, id)
    // total order the orientation used, so the closing edge (d1 → d2)
    // — if present — is oriented exactly that way and one equi-join
    // probe decides it
    val w2 = oriented.select(col("__s"), col("__d").as("__d2"),
      col("__dd").as("__dd2"))
    val wedges = oriented.join(w2, Seq("__s"))
      .where(col("__dd") < col("__dd2") ||
        (col("__dd") === col("__dd2") && col("__d") < col("__d2")))
      .select(col("__s"), col("__d"), col("__d2"))
    val triangles = wedges.join(
        oriented.select(col("__s").as("__d"), col("__d").as("__d2")),
        Seq("__d", "__d2"))
    val perNode = triangles
      .select(explode(array(col("__s"), col("__d"), col("__d2")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        // degree-1 nodes: 0 triangles over 0 wedges — pin 0.0, never
        // a 0/0 NaN (engines disagree on double 0/0 rendering)
        when(col("degree") < 2, lit(0.0)).otherwise(round(
          (coalesce(col("triangles"), lit(0L)) * 2.0) /
            (col("degree") * (col("degree") - lit(1L)))
            .cast("double"), 6)).as("coeff"))
  }

  /** Link prediction by the Resource-Allocation index (Zhou, Lü &
    * Zhang, EPJ B 2009): for every NON-adjacent pair `(x, y)` with at
    * least one common neighbor, `RA(x,y) = Σ_w 1/deg(w)` over common
    * neighbors `w` — the "which edges are missing" score behind
    * co-purchase recommendation and knowledge-graph completion. RA is
    * the exact-arithmetic member of the common-neighbor family: the
    * per-wedge weight quantizes to `1e6 div deg(w)` micro-units
    * (integer division of exact longs), so the summed score is an
    * exact BIGINT — bit-identical across engines and partitionings,
    * where Adamic-Adar's `1/ln(deg)` would ride on libm's last ulp.
    *
    * Scale shape: wedges are enumerated from the adjacency list
    * center-out — `deg(w)²` pairs per center `w` — so super-hub
    * centers dominate cost while contributing the LEAST per-pair
    * weight (1/deg). `maxCenterDeg` drops centers above the cutoff
    * (the published practice for RA/AA at scale; the dropped weight
    * is ≤ 1/maxCenterDeg per wedge). Candidate pairs then anti-join
    * the existing edge set, and the final top-k is a
    * TakeOrderedAndProject, never a global sort.
    *
    * Returns `(node_a, node_b, common_neighbors, ra_micro)` — the
    * `k` highest-scoring non-adjacent pairs, ties broken by
    * `(node_a, node_b)`.
    */
  def resourceAllocationScores(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxCenterDeg: Int = 1024): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxCenterDeg >= 2, "maxCenterDeg must be >= 2")
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    val und = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val adj = und.select(col("__a").as("__w"), col("__b").as("__n"))
      .union(und.select(col("__b"), col("__a")))
    val deg = adj.groupBy("__w").agg(count(lit(1)).as("__deg"))
    // centers: degree-capped, weight pre-quantized once per center
    val centers = adj.join(
        deg.where(col("__deg") <= maxCenterDeg &&
          col("__deg") >= 2), Seq("__w"))
      .withColumn("__wt", expr("1000000 div __deg"))
      .transform(graft.core.CacheScope.disk)
    val far = centers.select(col("__w"), col("__n").as("__n2"))
    val cand = centers.join(far, Seq("__w"))
      .where(col("__n") < col("__n2"))
      .groupBy(col("__n").as("__a"), col("__n2").as("__b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__wt")).as("ra_micro"))
    val nonEdges = cand.join(und, Seq("__a", "__b"), "left_anti")
    topK(nonEdges, col("ra_micro"), k, col("__a"), col("__b"))
      .select(col("__a").as("node_a"), col("__b").as("node_b"),
        col("common_neighbors"), col("ra_micro"))
  }

  /** k-core decomposition (the `k`-slice): the maximal subgraph in
    * which every node has degree ≥ `k` within the subgraph, by the
    * classic iterative peel — drop every node with current degree
    * < `k`, restrict the edges to survivors, repeat until a round
    * removes nothing. The k-core is the standard "dense engagement
    * backbone" cut (community cores, spam-ring detection, influence
    * seeding) that plain degree thresholding gets wrong: a degree-k
    * node whose neighbors all peel away is NOT core.
    *
    * Scale shape: each round is one grouped degree count plus two
    * semi-joins of the edge list against the (one row per node)
    * survivor set — all shuffle-partitioned by node id, no driver
    * data. Edges are `localCheckpoint`ed per round to truncate the
    * iterative lineage (the [[graft.dedup.ConnectedComponents]]
    * treatment), and the fixpoint test is a distributed count of
    * removed nodes. Peeling is MONOTONE (survivor sets only shrink,
    * and a stable round stays stable), so running extra rounds past
    * the fixpoint is a no-op — `maxRounds` only matters if the loop
    * is cut off early, which the returned flag exposes. Rounds needed
    * = number of "onion layers" below the core, ≤ peel depth of the
    * graph — single digits on co-occurrence graphs, never the node
    * count.
    *
    * Returns `(labels, converged)` where labels = `(node, core_degree)`
    * for the surviving nodes (`core_degree` = degree within the
    * k-core, ≥ k at a fixpoint). Self-loops and duplicate/reversed
    * edges are canonicalized away first.
    */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30): (DataFrame, Boolean) = {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "maxRounds must be positive")
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    var cur = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // LAZY checkpoint + count = ONE action per round: the fixpoint
      // count is the job that materializes the checkpointed degree
      // partitions (count computes every partition, so the checkpoint
      // is complete), and the keep-filter below reads the stored
      // partitions — an eager checkpoint here would run a second,
      // redundant materialization job every round
      val deg = cur.select(col("__a").as("node"))
        .union(cur.select(col("__b")))
        .groupBy("node").agg(count(lit(1)).as("__deg"))
        .localCheckpoint(false)
      val removed = deg.where(col("__deg") < k).count()
      if (removed == 0) {
        converged = true
      } else {
        val keep = deg.where(col("__deg") >= k).select("node")
        cur = cur
          .join(keep.withColumnRenamed("node", "__a"), Seq("__a"),
            "left_semi")
          .join(keep.withColumnRenamed("node", "__b"), Seq("__b"),
            "left_semi")
          .localCheckpoint(true)
      }
      rounds += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kCore did not reach a fixpoint within $maxRounds rounds; " +
          "the returned set is a SUPERSET of the k-core (raise " +
          "maxRounds)")
    val labels = cur.select(col("__a").as("node"))
      .union(cur.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
    (labels, converged)
  }

  /** Synchronous label propagation (LPA) community detection — the
    * cheap community cut between [[kCore]]'s density slice and
    * [[graft.dedup.ConnectedComponents]]'s reachability classes: every
    * node starts as its own label, and each round every node adopts
    * the MOST COMMON label among its neighbors (ties → the smallest
    * label; isolated label states impossible — every node in an edge
    * has neighbors). Communities are dense neighborhoods that out-vote
    * their boundary, which CC (one bridge merges everything) and
    * k-core (a fixed global k) both miss.
    *
    * Determinism is the design constraint, as everywhere in this
    * registry: updates are SYNCHRONOUS (all nodes switch on the same
    * round's labels — asynchronous LPA is schedule-dependent) and the
    * per-node vote argmax is pinned by (count desc, label asc), so a
    * fixed `rounds` run is a pure function of the edge set and the
    * DuckDB oracle can unroll it round by round. Fixed rounds rather
    * than a convergence test on purpose: sync LPA can 2-cycle on
    * bipartite-ish structures (the known oscillation), so "run k
    * rounds" IS the published stopping rule for the sync variant.
    *
    * Scale shape: per round, one join of the (node-partitioned)
    * adjacency against the one-row-per-node label frame, one
    * (node, label) grouped count (map-side combined — a hub's votes
    * pre-aggregate per partition), and one per-node argmax window over
    * groups bounded by the node's DISTINCT neighbor-label count
    * (≤ degree, shrinking as communities coalesce). Labels
    * `localCheckpoint` per round to truncate the iterative lineage —
    * the [[kCore]] treatment. No driver-side data, rounds fixed.
    *
    * Returns `(node, community)` — `community` is the round-`rounds`
    * label (a member node id; NOT canonicalized to the component
    * minimum, communities are finer than components).
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val und = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
    val adj = und
      .select(col("__a").as("node"), col("__b").as("nbr"))
      .union(und.select(col("__b"), col("__a")))
      .localCheckpoint(true)
    var labels = adj.select(col("node")).distinct()
      .withColumn("community", col("node"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val votes = adj
        .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy("node", "community")
        .agg(count(lit(1)).as("__votes"))
      val w = Window.partitionBy("node")
        .orderBy(col("__votes").desc, col("community").asc)
      labels = votes
        .withColumn("__r", row_number().over(w))
        .where(col("__r") === 1)
        .select("node", "community")
        .localCheckpoint(true)
      r += 1
    }
    labels
  }

  /** Newman modularity of a community labeling — the quality score
    * that closes the community-detection loop ([[labelPropagation]]
    * proposes, modularity judges): per community,
    * `q_c = e_c/m − (d_c/2m)²` — internal-edge share minus the share
    * a degree-preserving random graph would give it. Positive
    * contributions mean denser-than-chance; Σ q_c is the labeling's
    * modularity Q ∈ [−0.5, 1].
    *
    * Exact integer arithmetic end-to-end: with m total undirected
    * edges, `q_c·4m² = 4·m·e_c − d_c²` is an exact integer identity,
    * so each community's contribution is computed as
    * `(4·m·e_c − d_c²)·1e6 div 4m²` in DECIMAL(38,0) (products of two
    * edge-count-sized BIGINTs overflow 2^63 at ~10⁹ edges — decimal
    * carries them exactly; the micro result is BIGINT again).
    * Contributions can be NEGATIVE (sparser than chance); integer
    * division truncates TOWARD ZERO in BOTH engines (Spark
    * IntegralDivide and DuckDB `//` agree on negatives — verified;
    * this is the registry's one site where a negative `div` operand
    * is load-bearing), so each community's µ-value is
    * exact-to-truncation and Σ contributions tracks the real Q
    * within |communities| µ-units.
    *
    * Scale shape: one join of the canonical edge list against the
    * labels per endpoint (node-keyed), one community-keyed count for
    * e_c (only same-community edges survive the filter), one for d_c
    * — every aggregate map-side combined, output community-sized.
    *
    * Returns `(community, n_nodes, internal_edges, degree_sum,
    * q_contrib_micro)`; unlabeled endpoints fail loudly via an inner
    * join count contract — callers label every node (the
    * [[labelPropagation]] output does by construction).
    */
  def modularityScore(
      edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val und = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val lab = labels.select(col("node"), col("community"))
    val labeled = und
      .join(lab.select(col("node").as("__a"),
        col("community").as("__ca")), Seq("__a"))
      .join(lab.select(col("node").as("__b"),
        col("community").as("__cb")), Seq("__b"))
      .transform(graft.core.CacheScope.disk)
    val m = labeled.agg(count(lit(1)).as("__m"))
    val eIn = labeled.where(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val deg = labeled
      .select(col("__a").as("node"), col("__ca").as("community"))
      .union(labeled.select(col("__b"), col("__cb")))
      .groupBy("node", "community")
      .agg(count(lit(1)).as("__d"))
    val dSum = deg.groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("degree_sum"))
    dSum.join(eIn, Seq("community"), "left")
      .withColumn("internal_edges",
        coalesce(col("internal_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib_micro",
        expr("cast((4 * cast(__m as decimal(38,0)) * internal_edges" +
          " - cast(degree_sum as decimal(38,0)) * degree_sum)" +
          " * 1000000 div (4 * cast(__m as decimal(38,0)) * __m)" +
          " as long)"))
      .select("community", "n_nodes", "internal_edges", "degree_sum",
        "q_contrib_micro")
  }

  /** Fixed-point integer HITS (hubs & authorities) over a DIRECTED
    * distinct edge list — the bipartite-role sibling of [[pageRank]]:
    * `iters` synchronous rounds of `h(u) = Σ_{u→v} a(v)` then
    * `a(v) = Σ_{u→v} h(u)`, each side L1-normalized to 1e12
    * fixed-point units after its half-round. On a purchase graph
    * customers score as hubs (they point at many good suppliers) and
    * suppliers as authorities (pointed at by many good customers) —
    * the two-sided "who matters" ranking PageRank's single score
    * conflates.
    *
    * Exactness contract: scores live in BIGINT 1e12 units (init
    * `1e12 div n` per node — sides renormalize to Σ ≤ 1e12 every
    * half-round, so every per-node raw sum is ≤ 1e12); the
    * normalization `raw·1e12 div total` computes through
    * DECIMAL(38,0) (the numerator is ~1e24 — past 2^63; Spark's
    * IntegralDivide returns BIGINT, truncation toward zero, matching
    * DuckDB HUGEINT `//` exactly), and the raw-sum TOTAL also
    * accumulates in DECIMAL(38,0) (Σ_v indeg(v)·a(v) overflows BIGINT
    * at hub degrees ~10⁷). Results are bit-identical across engines
    * and partitionings. L1 rather than the classical L2 norm on
    * purpose: the L1 total is an exact integer sum (L2 needs a
    * square root — no longer integer-exact), and normalization
    * choice does not change the RANKING either way.
    *
    * Mass semantics ([[pageRank]]'s dangling note, adapted): nodes
    * with no out-edges have h = 0, nodes with no in-edges have a = 0
    * — their previous-round mass leaves the system at the next
    * normalization (HITS concentrates mass on the connected core;
    * that is the algorithm, not a leak). Per-round `div` floors drop
    * < n units/round.
    *
    * Scale shape: the edge list persists once, repartitioned+sorted
    * on `__src` (and a dst-keyed twin) so each half-round's join
    * re-sorts only the score side; per-node sums are map-side
    * combined; totals ride a broadcast one-row frame; per-round
    * lineage truncates via `localCheckpoint`. Per-round shuffle of
    * the contribution aggregate is inherent, as in [[pageRank]].
    *
    * Returns `(node, hub_scaled, auth_scaled)` — one row per node in
    * the edge list's node universe.
    */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val scale = 1000000000000L // 1e12 fixed-point unit
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .transform(graft.core.CacheScope.disk)
    // src-sorted and dst-sorted twins: each half-round joins scores on
    // ONE side; pre-sorting both orientations keeps every round's
    // per-edge join a sort-merge against cached order
    val bySrc = e.repartition(col("__src"))
      .sortWithinPartitions("__src")
      .transform(graft.core.CacheScope.disk)
    val byDst = e.repartition(col("__dst"))
      .sortWithinPartitions("__dst")
      .transform(graft.core.CacheScope.disk)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = nodes.count()
    // renormalize `raw` (node-keyed sums) to Σ = scale in exact
    // decimal arithmetic; nodes absent from `raw` score 0
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(
        sum(col("__raw").cast("decimal(38,0)")).as("__tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          coalesce(
            expr(s"(cast(__raw as decimal(38,0)) * $scale) div __tot"),
            lit(0L)).as(outCol))
        .localCheckpoint()
    }
    var auth = nodes.select(col("node"),
      lit(scale / n).as("auth_scaled")).localCheckpoint()
    var hub = auth.select(col("node"), col("auth_scaled").as("hub_scaled"))
    for (_ <- 1 to iters) {
      // hub half-round joins ON __dst (gathering auth of the edge's
      // destination), so it must read the dst-sorted twin; the auth
      // half-round joins ON __src and reads the src-sorted one. (The
      // twins were swapped until r17 — each half-round re-shuffled the
      // whole edge list instead of only the node-sized score frame.)
      val hraw = byDst
        .join(auth.select(col("node").as("__dst"),
          col("auth_scaled").as("__s")), Seq("__dst"))
        .groupBy(col("__src").as("node"))
        .agg(sum(col("__s")).as("__raw"))
      hub = normalized(hraw, "hub_scaled")
      val araw = bySrc
        .join(hub.select(col("node").as("__src"),
          col("hub_scaled").as("__s")), Seq("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__s")).as("__raw"))
      auth = normalized(araw, "auth_scaled")
    }
    hub.join(auth, Seq("node"))
  }
}
