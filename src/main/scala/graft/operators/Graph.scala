package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over explicit edge frames — PageRank and degree
  * profiling for the curation graphs this engine already builds
  * ([[graft.llm.Similarity.knnGraph]] kNN edges, [[graft.llm.Dedup]]
  * candidate pairs). PageRank over the kNN graph is the standard
  * "representativeness" signal for graph-based data curation: high-rank
  * nodes sit in dense semantic neighborhoods (over-represented content →
  * downweight), leaf nodes are outliers (review queue) — the same use the
  * reference's status/topology rollups serve for device graphs
  * (yahoo_panoptes/framework/resources.py builds the resource topology;
  * we generalize the iterate-over-edges shape).
  *
  * == Engine-exact fixed-point arithmetic ==
  * Ranks are BIGINT micro-masses on a `scale` grid (default 10¹²), every
  * step an integer op — `p div deg` per out-edge, exact long sums, and
  * `((100-d)·(scale div N) + d·in) div 100` for the damped update — so
  * any engine replaying the same unrolled iterations reproduces the
  * BIT-EXACT ranks (the [[graft.llm.CountMin]] posture: determinism via
  * integers, not via float tolerance). Truncation loses < 1 unit per op
  * on a 10¹² grid — immaterial for ordering, essential for oracles.
  *
  * == Scale shape ==
  * Per iteration: one shuffle join of edges with the rank frame on `src`
  * (both hash-partitioned on the same key — AQE coalesces), one hash
  * aggregate on `dst` with map-side partial sums (longs), one left join
  * back to the node set. Nothing is collected; N rides as a broadcast
  * 1-row frame. `localCheckpoint` cuts the lineage each round (the
  * [[graft.llm.Dedup.clusters]] iteration discipline) so the plan does
  * not deepen with `iters`. At 100 TB the edge frame is the big side and
  * stays hash-partitioned by `src` across all iterations; the rank frame
  * is |V| rows.
  *
  * Dangling nodes (no out-edges) keep their mass out of circulation —
  * the "remove dangling mass" PageRank variant — which is the right
  * semantics for a kNN graph where edge-less nodes are bucket singletons
  * that should not boost anyone.
  */
object Graph {

  /** Fixed-point damped PageRank. `nodes`: one row per vertex (`idCol`);
    * `edges`: directed (srcCol, dstCol), parallel edges allowed only if
    * the caller deduplicated upstream (each row contributes).
    *
    * Output: (idCol, pr_fp BIGINT exact rank mass on the `scale` grid,
    * pr_ppm BIGINT = parts-per-million rank, exact). */
  def pagerank(nodes: DataFrame, edges: DataFrame, idCol: String,
               srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 3, dampPct: Int = 85,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct=$dampPct not a pct")
    // materialize the graph ONCE: edges may carry an expensive lineage
    // (the kNN build's LSH join + ranking window) that would otherwise
    // re-execute inside EVERY iteration's join — the checkpoint turns
    // iters × edge-derivation into 1×, and pins the edge partitioning
    // that all iterations' src-joins then reuse
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nN = broadcast(n.agg(count(lit(1)).cast("long").as("n_nodes")))
    // per-node base mass (scale div N) and the uniform start vector
    def nextP(prev: DataFrame): DataFrame = {
      val contrib = prev.join(deg, prev("id") === deg("src"))
        .select(col("src"), expr("pr_fp div deg").as("c"))
      val in = e.join(contrib, "src")
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("inm"))
      n.join(in, Seq("id"), "left").crossJoin(nN)
        .withColumn("inm", coalesce(col("inm"), lit(0L)))
        .select(col("id"), expr(
          s"(${100 - dampPct} * ($scale div n_nodes) + $dampPct * inm) div 100")
          .as("pr_fp"))
        .localCheckpoint()
    }
    var p = n.crossJoin(nN)
      .select(col("id"), expr(s"$scale div n_nodes").as("pr_fp"))
    for (_ <- 1 to iters) p = nextP(p)
    p.select(col("id").as(idCol), col("pr_fp"),
      expr("pr_fp div 1000000").as("pr_ppm"))
  }

  /** WEIGHTED fixed-point PageRank: each out-edge carries an integer
    * weight (`weightCol`, e.g. a similarity score scaled onto an integer
    * grid) and a node's rank mass splits ∝ weight instead of uniformly —
    * per edge the contribution is `(pr_fp · w) div Σw_src`, every op
    * still exact integer arithmetic on the `scale` grid, so the
    * bit-exact unrolled-oracle property of [[pagerank]] carries over
    * unchanged. For a kNN curation graph this weights centrality by HOW
    * similar the neighbors are, not just how many point in.
    *
    * Non-positive weights are dropped up front (they carry no mass and
    * a node whose every edge were ≤ 0 would divide by zero) — such a
    * node becomes dangling, exactly like an edge-less node in
    * [[pagerank]]. Caller contract: `scale × max(w) < 2⁶³` (the default
    * 10¹² grid leaves room for weights to ~9·10⁶).
    *
    * Scale shape is [[pagerank]]'s: per iteration one edge⋈rank join on
    * the pinned src partitioning (plus the |V|-row Σw frame on the same
    * key), one dst aggregate with map-side partial sums, one node-set
    * left join. */
  def pagerankWeighted(nodes: DataFrame, edges: DataFrame, idCol: String,
                       srcCol: String = "src", dstCol: String = "dst",
                       weightCol: String = "weight",
                       iters: Int = 3, dampPct: Int = 85,
                       scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct=$dampPct not a pct")
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0L)
      .repartition(col("src")).localCheckpoint()
    val wsum = e.groupBy("src").agg(sum(col("w")).as("wsum"))
      .localCheckpoint()
    val nN = broadcast(n.agg(count(lit(1)).cast("long").as("n_nodes")))
    def nextP(prev: DataFrame): DataFrame = {
      val contrib = e
        .join(prev.select(col("id").as("src"), col("pr_fp")), Seq("src"))
        .join(wsum, Seq("src"))
        .select(col("dst"), expr("(pr_fp * w) div wsum").as("c"))
      val in = contrib.groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("inm"))
      n.join(in, Seq("id"), "left").crossJoin(nN)
        .withColumn("inm", coalesce(col("inm"), lit(0L)))
        .select(col("id"), expr(
          s"(${100 - dampPct} * ($scale div n_nodes) + $dampPct * inm) div 100")
          .as("pr_fp"))
        .localCheckpoint()
    }
    var p = n.crossJoin(nN)
      .select(col("id"), expr(s"$scale div n_nodes").as("pr_fp"))
    for (_ <- 1 to iters) p = nextP(p)
    p.select(col("id").as(idCol), col("pr_fp"),
      expr("pr_fp div 1000000").as("pr_ppm"))
  }

  /** PERSONALIZED fixed-point PageRank: the teleport mass returns only
    * to `seeds` instead of spreading uniformly, so ranks measure
    * proximity to the seed set — the standard graph-expansion ranking
    * ("find more like my curated examples") that [[labelPropagate]]'s
    * hard labels approximate softly. Same integer scheme as
    * [[pagerank]]: p'(v) = ((100−d)·(scale div |S|)·[v∈S] + d·in(v))
    * div 100, every op exact, dangling mass dropped. Nodes unreachable
    * from the seeds converge to rank 0 — the point of the
    * personalization.
    *
    * Scale shape is [[pagerank]]'s: per iteration one edge⋈rank join on
    * the pinned src partitioning, one dst aggregate, one node-set left
    * join; the seed set rides as a broadcast semi-join flag. */
  def pagerankPersonalized(nodes: DataFrame, seeds: DataFrame,
                           edges: DataFrame, idCol: String,
                           srcCol: String = "src", dstCol: String = "dst",
                           iters: Int = 3, dampPct: Int = 85,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct=$dampPct not a pct")
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val sd = seeds.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nS = broadcast(sd.agg(count(lit(1)).cast("long").as("n_seeds")))
    val flagged = n.join(broadcast(sd.withColumn("__is_seed", lit(1L))),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__is_seed"), lit(0L)).as("__s"))
      .localCheckpoint()
    def nextP(prev: DataFrame): DataFrame = {
      val contrib = prev.join(deg, prev("id") === deg("src"))
        .select(col("src"), expr("pr_fp div deg").as("c"))
      val in = e.join(contrib, "src")
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("inm"))
      flagged.join(in, Seq("id"), "left").crossJoin(nS)
        .withColumn("inm", coalesce(col("inm"), lit(0L)))
        .select(col("id"), expr(
          s"(${100 - dampPct} * ($scale div n_seeds) * __s + " +
            s"$dampPct * inm) div 100").as("pr_fp"))
        .localCheckpoint()
    }
    var p = flagged.crossJoin(nS)
      .select(col("id"), expr(s"($scale div n_seeds) * __s").as("pr_fp"))
    for (_ <- 1 to iters) p = nextP(p)
    p.select(col("id").as(idCol), col("pr_fp"),
      expr("pr_fp div 1000000").as("pr_ppm"))
  }

  /** Semi-supervised label propagation over an edge frame: seed nodes
    * keep their label (clamped), unlabeled nodes adopt each round the
    * most common label among their in-neighbors' current labels —
    * synchronous updates, `iters` rounds. The standard cheap classifier
    * for spreading a small set of curated labels (topic, quality tier,
    * license) across a kNN/similarity graph.
    *
    * Deterministic by construction: votes are exact integer counts and
    * the argmax breaks ties on the SMALLEST label, so any engine
    * replaying the same unrolled rounds reproduces the labels exactly.
    * A node with no labeled in-neighbors keeps its previous label
    * (possibly null — never-reached nodes stay unlabeled).
    *
    * Scale shape per round: one edge⋈labels shuffle join on `src`
    * (edge partitioning pinned once by the up-front checkpoint), one
    * (dst, label) hash aggregate with map-side partials, one per-node
    * argmax window (|V|·|labels-per-node| rows, bounded by in-degree),
    * two left joins back to the node set. `localCheckpoint` per round
    * caps plan depth. Nothing collects.
    */
  def labelPropagate(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
                     idCol: String, labelCol: String,
                     srcCol: String = "src", dstCol: String = "dst",
                     iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).localCheckpoint()
    val sd = seeds.select(col(idCol).as("id"), col(labelCol).as("seed"))
      .localCheckpoint()
    var lab = n.join(sd, Seq("id"), "left")
      .select(col("id"), col("seed").as("label"))
    for (_ <- 1 to iters) {
      val votes = e
        .join(lab.filter(col("label").isNotNull)
          .select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val pick = votes
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("c").desc, col("label"))))
        .filter(col("__rn") === 1)
        .select(col("id"), col("label").as("vote"))
      lab = n.join(sd, Seq("id"), "left")
        .join(pick, Seq("id"), "left")
        .join(lab.select(col("id"), col("label").as("prev")), Seq("id"),
          "left")
        .select(col("id"),
          coalesce(col("seed"), col("vote"), col("prev")).as("label"))
        .localCheckpoint()
    }
    lab.select(col("id").as(idCol), col("label"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) on a directed edge
    * frame: a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), re-normalized each
    * half-step. On a kNN curation graph authority flags content many
    * similar neighborhoods point AT (canonical/over-represented
    * passages), hub flags content whose OWN neighbor list covers the
    * canonical set — the two sides of the duplication picture PageRank
    * folds into one number.
    *
    * == Engine-exact fixed-point arithmetic ==
    * The textbook L2 normalization needs a sqrt — libm, not
    * oracle-replayable — so this uses the equally standard L1 variant:
    * scores are BIGINT masses on the `scale` grid and each half-step
    * renormalizes by x' = (x_raw · scale) div Σx_raw, every op an exact
    * integer op ([[pagerank]]'s posture), so unrolled oracle iterations
    * replay BIT-EXACTLY. An edge-less graph (Σ = 0) yields all-zero
    * scores via an explicit guard rather than a division by zero.
    *
    * Caller contract: `scale² · max degree < 2⁶³` — a raw mass is ≤
    * scale · deg before renormalizing, and the renormalization multiplies
    * by scale again. The default 10⁸ grid holds to degree ~922; size
    * `scale` down for hubbier graphs. ENFORCED at runtime: one cheap
    * degree aggregate before the iteration loop errors (IAE) instead of
    * silently wrapping the renormalization multiply into negative masses
    * on a hub graph.
    *
    * Scale shape per half-step: one edge⋈score shuffle join on the
    * pinned edge partitioning, one hash aggregate with map-side partial
    * long sums, one 1-row total broadcast-attached, one node-set left
    * join; `localCheckpoint` per round caps plan depth. Nothing
    * corpus-sized collects.
    *
    * Output: (idCol, auth_fp BIGINT, hub_fp BIGINT) on the `scale` grid. */
  def hits(nodes: DataFrame, edges: DataFrame, idCol: String,
           srcCol: String = "src", dstCol: String = "dst",
           iters: Int = 3, scale: Long = 100000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(scale >= 100L, s"scale=$scale too coarse")
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).localCheckpoint()
    // enforce the overflow contract with the max ONE-SIDED degree (the
    // authority raw is bounded by in-degree, the hub raw by out-degree —
    // summing the sides would reject valid graphs, e.g. 500-in/500-out
    // at the default grid); one aggregate keyed by (side, vertex)
    val maxDeg = e.select(explode(array(
        struct(lit(0).as("side"), col("src").as("id")),
        struct(lit(1).as("side"), col("dst").as("id")))).as("sv"))
      .groupBy(col("sv.side"), col("sv.id")).agg(count(lit(1)).as("d"))
      .agg(coalesce(max(col("d")), lit(0L))).first().getLong(0)
    require(BigInt(scale) * scale * math.max(maxDeg, 1L) <= Long.MaxValue,
      s"hits overflow contract violated: scale^2 * maxOneSidedDegree = " +
        s"$scale^2 * $maxDeg exceeds 2^63 - 1; pass a smaller scale " +
        s"(the default 1e8 grid holds to degree ~922)")
    val nN = broadcast(n.agg(count(lit(1)).cast("long").as("n_nodes")))
    // renormalize a raw-mass frame onto the grid: (id, raw) → (id, fp);
    // the total rides as a broadcast 1-row frame (corpus-stat pattern)
    def renorm(raw: DataFrame, outCol: String): DataFrame = {
      val tot = broadcast(raw.agg(
        coalesce(sum(col("raw")), lit(0L)).as("__tot")))
      n.join(raw, Seq("id"), "left").crossJoin(tot)
        .select(col("id"), expr(
          s"CASE WHEN __tot = 0 THEN 0L " +
            s"ELSE (coalesce(raw, 0L) * $scale) div __tot END")
          .as(outCol))
        .localCheckpoint()
    }
    var h = n.crossJoin(nN)
      .select(col("id"), expr(s"$scale div n_nodes").as("hub_fp"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = e
        .join(h.select(col("id").as("src"), col("hub_fp")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("hub_fp")).as("raw"))
      a = renorm(araw, "auth_fp")
      val hraw = e
        .join(a.select(col("id").as("dst"), col("auth_fp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum(col("auth_fp")).as("raw"))
      h = renorm(hraw, "hub_fp")
    }
    a.join(h, Seq("id"))
      .select(col("id").as(idCol), col("auth_fp"), col("hub_fp"))
  }

  /** Per-vertex triangle counting + local clustering coefficient over an
    * UNDIRECTED canonical edge frame (one row per edge, `aCol` < `bCol`)
    * — the density diagnostic for curation graphs: high-triangle nodes
    * sit in tightly-knit near-duplicate cliques (candidates for
    * [[graft.llm.Clustering.semDeDup]]-style thinning), triangle-free
    * hubs are star centers (boilerplate linking unrelated content).
    *
    * Uses the DEGREE-ORDERED orientation (the MapReduce-era standard —
    * Suri & Vassilvitskii 2011's approach to "counting triangles and the
    * curse of the last reducer"): each edge points from its lower to its
    * higher endpoint in the total order (deg, id), wedges form only at a
    * triangle's LOWEST-ordered corner, and a closing edge lookup
    * confirms. Every triangle is found exactly once, and — the 100 TB
    * point — a degree-D hub contributes wedges only through its
    * HIGHER-ordered out-edges (O(arboricity) each, not O(D²)): the
    * skew-killer that makes this survive power-law graphs where the
    * naive all-wedges join melts the hot reducer.
    *
    * Exact integer output, no floats: `tri` is a count and the local
    * clustering coefficient is emitted as `lcc_ppm` = (2·tri·10⁶) div
    * (deg·(deg−1)) — parts-per-million on the fixed grid, 0 for deg < 2.
    *
    * Scale shape: one degree aggregate, two broadcast-or-shuffle joins
    * to attach endpoint degrees, one self-join on the wedge corner, one
    * closing equi-join on (lo, hi) pairs, one final hash aggregate of
    * exploded corners. All equi-joins on graph keys; nothing collects.
    *
    * Output: (idCol, deg, tri, lcc_ppm), every node in `nodes`. */
  def triangles(nodes: DataFrame, undirected: DataFrame, idCol: String,
                aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val ue = undirected.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    val deg = ue.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient by the total order (deg, id): lo → hi
    val withDeg = ue
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
    val lower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
        when(lower, col("a")).otherwise(col("b")).as("lo"),
        when(lower, col("b")).otherwise(col("a")).as("hi"),
        when(lower, col("db")).otherwise(col("da")).as("dhi"))
      .localCheckpoint()
    // wedges at the lowest-ordered corner: two out-edges of `lo`, the
    // endpoints ordered between themselves so the closing edge is the
    // oriented (v, w) row itself
    val x = o.select(col("lo"), col("hi").as("v"), col("dhi").as("dv"))
    val y = o.select(col("lo"), col("hi").as("w"), col("dhi").as("dw"))
    val vw = col("dv") < col("dw") ||
      (col("dv") === col("dw") && col("v") < col("w"))
    val wedges = x.join(y, Seq("lo")).filter(vw)
      .select(col("lo"), col("v"), col("w"))
    val tris = wedges.join(
      o.select(col("lo").as("v"), col("hi").as("w")), Seq("v", "w"))
    val perNode = tris
      .select(explode(array(col("lo"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    n.join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        expr("CASE WHEN coalesce(deg, 0L) < 2 THEN 0L " +
          "ELSE (2 * coalesce(tri, 0L) * 1000000) div (deg * (deg - 1)) " +
          "END").as("lcc_ppm"))
  }

  /** Link prediction over an UNDIRECTED canonical edge frame: for every
    * NON-adjacent pair sharing ≥ 1 neighbor, the three classic scores —
    * common-neighbor count, Adamic–Adar (Σ 1/ln deg(z) over shared
    * neighbors z: rare mutual friends count more), and Jaccard over the
    * neighbor sets. On a near-dup/kNN curation graph these are the
    * "pairs the blocking stage missed" review queue: two documents that
    * share most of their neighborhoods but never met in a bucket.
    *
    * Determinism: cn and degrees are exact longs; each 1/ln(deg z) term
    * is rounded onto the 10⁻⁹ grid as an integer nano-mass
    * `round(10⁹/ln(deg z))` BEFORE the exact BIGINT sum — the same
    * fixed-point discipline as [[hits]]' `*_fp` and [[triangles]]'
    * `lcc_ppm`, so no non-integer column ever leaves the graph family
    * (only `ln` touches libm, on identical integer inputs; a term is ≤
    * 10⁹/ln 2 ≈ 1.44·10⁹ and deg ≤ k on a kNN substrate, so the sum
    * cannot overflow). Jaccard ships as exact integer ppm `(cn·10⁶) div
    * (deg_a + deg_b − cn)`. Wedge centers have deg ≥ 2 by construction
    * (they join two distinct neighbors), so ln(deg) ≥ ln 2 > 0 — no
    * division-by-zero path exists.
    *
    * Scale shape: one degree aggregate; one wedge self-join of the
    * symmetrized adjacency on the center vertex — fan-out Σ deg(z)²,
    * bounded by k² per node on a kNN graph (for power-law graphs cap or
    * split hot centers first, the [[triangles]] orientation argument);
    * one left-anti join against the existing edges; one hash aggregate
    * per candidate pair. All equi-joins on vertex/pair keys; nothing
    * collects.
    *
    * Output: (id_a, id_b, cn, aa_nano BIGINT, jaccard_ppm), id_a < id_b,
    * every non-adjacent pair with cn ≥ 1. */
  def linkPredict(undirected: DataFrame, aCol: String = "id_a",
                  bCol: String = "id_b"): DataFrame = {
    val ue = undirected.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    val sym = ue.unionByName(ue.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // wedges through center z: (z, v) ⋈ (z, w), v < w — each shared
    // neighbor of the candidate pair contributes one center row
    val x = sym.select(col("a").as("z"), col("b").as("v"))
    val y = sym.select(col("a").as("z"), col("b").as("w"))
    val wedges = x.join(y, Seq("z")).filter(col("v") < col("w"))
    val open = wedges.join(ue.select(col("a").as("v"), col("b").as("w")),
      Seq("v", "w"), "left_anti")
    val scored = open
      .join(deg.select(col("id").as("z"), col("deg").as("dz")), Seq("z"))
      .groupBy(col("v"), col("w"))
      .agg(count(lit(1)).as("cn"),
        sum(round(lit(1.0e9) / log(col("dz").cast("double")), 0)
          .cast("long")).as("aa_nano"))
    scored
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .join(deg.select(col("id").as("w"), col("deg").as("dw")), Seq("w"))
      .select(col("v").as(aCol), col("w").as(bCol), col("cn"),
        col("aa_nano"),
        expr("(cn * 1000000) div (dv + dw - cn)").as("jaccard_ppm"))
  }

  /** Bounded-round k-core peeling (Seidman 1983 cores; the Matula–Beck
    * peel) over an UNDIRECTED canonical edge frame: repeatedly delete
    * vertices of degree < `k` (with their edges), `rounds` times, then
    * test membership once more on the residual graph. The density tier
    * BETWEEN [[degreeProfile]] (local) and [[triangles]] (cliquish):
    * k-core membership certifies a connected region where EVERY member
    * keeps ≥ k surviving neighbors — on a near-dup curation graph the
    * stable duplication communities that survive after hubs and
    * stragglers peel away (thin those with
    * [[graft.llm.Clustering.semDeDup]]-style caps), versus the
    * pendant/star periphery that exact-dedup alone handles.
    *
    * Bounded rounds, not run-to-fixpoint: unbounded peeling is a
    * data-dependent number of jobs (worst case the degeneracy ordering,
    * O(|V|) rounds on a path) — the wrong shape for a shared cluster
    * and un-unrollable for the oracle. On a kNN substrate (deg ≤ the
    * graph's k) the peel converges in a few rounds; callers wanting a
    * checkable contract run [[kCoreCertificate]] — survivor counts at
    * `rounds` and `rounds`+1 and a `converged` flag, costing one extra
    * peel round and a single 1-row aggregate on top of the shared peel
    * prefix (never a corpus crossJoin).
    *
    * Scale shape per round: one degree aggregate (map-side combined
    * long counts) and two semi-join restrictions of the edge frame on
    * its endpoint keys — all equi-joins on vertex ids, nothing
    * collects; `localCheckpoint` per round caps plan depth exactly like
    * the [[pagerank]]/[[hits]] loops. Exact integer outputs.
    *
    * Output: (idCol, in_core boolean, core_deg) for EVERY node in
    * `nodes` — core_deg is the member's residual degree (≥ k), 0 for
    * non-members. */
  def kCore(nodes: DataFrame, undirected: DataFrame, idCol: String,
            k: Int, rounds: Int, aCol: String = "id_a",
            bCol: String = "id_b"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 50, s"rounds=$rounds out of [1,50]")
    val n = nodes.select(col(idCol).as("id")).distinct().localCheckpoint()
    val e = peel(canonicalEdges(undirected, aCol, bCol), k, rounds)
    val member = coreDegrees(e).filter(col("deg") >= k)
    n.join(member, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("deg").isNotNull.as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_deg"))
  }

  /** Convergence certificate for [[kCore]]'s bounded peel. One row:
    *
    *  - `survivors_r` / `survivors_r1`: vertices with residual degree
    *    ≥ `k` after `rounds` and `rounds`+1 peels — the honest
    *    intermediate read (how much the next round would still move);
    *  - `pending_below_k`: vertices STILL PRESENT in the residual edge
    *    frame with degree < `k` — the next round's peel set;
    *  - `converged` = `pending_below_k` == 0.
    *
    * The sound fixpoint test is `pending_below_k` == 0 — every residual
    * vertex keeps ≥ k residual neighbors, so the next restriction
    * removes nothing and the bounded result IS the exact k-core
    * (membership AND residual degrees final). Comparing survivor
    * COUNTS at R and R+1 is NOT sufficient, though it looks monotone:
    * membership can plateau for a round while member↔non-member edges
    * are still being deleted, so residual degrees (and, rounds later,
    * membership itself) may still change — a randomized property test
    * caught exactly that graph (PropertySpec; member sets equal at
    * R/R+1, a member's core_deg still dropped at R+2).
    *
    * Cost: the shared peel prefix (identical jobs to [[kCore]]), ONE
    * extra peel round for the survivors_r1 report, and a single 1-row
    * hash aggregate over tagged degree rows — no corpus crossJoin, no
    * collect. */
  def kCoreCertificate(undirected: DataFrame, k: Int, rounds: Int,
                       aCol: String = "id_a", bCol: String = "id_b")
      : DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 50, s"rounds=$rounds out of [1,50]")
    val eR = peel(canonicalEdges(undirected, aCol, bCol), k, rounds)
    // ONE checkpointed degree frame of eR serves both the tagged counts
    // and the extra round's keep set — inlining the last restriction
    // avoids peel()'s internal (duplicate) degree aggregate over eR
    val dR = coreDegrees(eR).localCheckpoint()
    val keep = dR.filter(col("deg") >= k).select("id")
    val eR1 = eR.join(keep.select(col("id").as("a")), Seq("a"))
      .join(keep.select(col("id").as("b")), Seq("b"))
      .select(col("a"), col("b"))
    // one union + one 1-row aggregate instead of a crossJoin of scalar
    // frames: all three counts stream through the same map-side combine
    val tagged = dR
      .select(when(col("deg") >= k, 0).otherwise(2).as("t"))
      .unionByName(coreDegrees(eR1).filter(col("deg") >= k)
        .select(lit(1).as("t")))
    tagged.agg(
        coalesce(sum(when(col("t") === 0, 1L)), lit(0L)).as("survivors_r"),
        coalesce(sum(when(col("t") === 1, 1L)), lit(0L)).as("survivors_r1"),
        coalesce(sum(when(col("t") === 2, 1L)), lit(0L))
          .as("pending_below_k"))
      .select(col("survivors_r"), col("survivors_r1"),
        col("pending_below_k"),
        (col("pending_below_k") === 0L).as("converged"))
  }

  /** Canonical undirected edge frame: (a < b), deduplicated. */
  private def canonicalEdges(undirected: DataFrame, aCol: String,
                             bCol: String): DataFrame =
    undirected.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()

  /** Per-vertex residual degree of a canonical (a, b) edge frame. */
  private def coreDegrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  /** `rounds` peel iterations: drop vertices of degree < k with their
    * edges. Per round one map-side-combined degree aggregate and two
    * semi-join restrictions on the endpoint keys; `localCheckpoint`
    * caps plan depth (the [[pagerank]]/[[hits]] loop discipline). */
  private def peel(e0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = e0
    for (_ <- 1 to rounds) {
      val keep = coreDegrees(e).filter(col("deg") >= k)
        .select("id").localCheckpoint()
      e = e.join(keep.select(col("id").as("a")), Seq("a"))
        .join(keep.select(col("id").as("b")), Seq("b"))
        .select(col("a"), col("b")).localCheckpoint()
    }
    e
  }

  /** Degree profile of a directed edge frame: per-vertex out/in degree —
    * the hub/orphan diagnostic read before running PageRank or components
    * over a curation graph. One aggregate per direction and one full
    * outer merge, all hash-partitioned on the vertex id; no global sort
    * or single-partition window anywhere (rank hubs downstream with a
    * top-k heap, not a total order). */
  def degreeProfile(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dstCol).as("id"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("total_deg", col("out_deg") + col("in_deg"))
  }
}
