package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Ckpt.PinOps

/** Graph operators over edge frames — the corpus-as-a-graph tier of the
  * curation surface. Web-scale training corpora carry link structure
  * (hyperlinks, citation edges, near-dup adjacency), and the standard
  * quality prior over that structure is link centrality: CommonCrawl
  * curation weights pages by a PageRank-family score before sampling.
  * Edges live in an ordinary DataFrame `(src, dst)`; nodes are whatever
  * the id columns hold. Ref parity note: the reference has no graph
  * operators; extends the analytics surface per the training-data-ops
  * mandate (SURVEY §2 addendum).
  */
object Graph {

  /** Per-node degree summary: `node | out_degree | in_degree` over the
    * edge frame AS GIVEN (multi-edges count once each — dedupe upstream
    * if the semantics want simple-graph degrees). One groupBy per
    * direction + a null-safe full outer join on node — both exchanges
    * are node-grain, never edge-grain. Nodes appearing only as source
    * (or only as destination) report 0 on the absent side. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    // ONE pass + ONE exchange (r14): each edge row explodes into an
    // out-credit for src and an in-credit for dst, summed per node —
    // replaces two aggregates over two evaluations of the edge plan plus
    // a full-outer join (3 exchanges, and the caller's plan ran twice)
    edges
      .select(explode(array(
        struct(col(srcCol).as("node"), lit(1L).as("o"), lit(0L).as("i")),
        struct(col(dstCol).as("node"), lit(0L).as("o"), lit(1L).as("i"))))
        .as("__d"))
      .groupBy(col("__d.node").as("node"))
      .agg(sum(col("__d.o")).as("out_degree"), sum(col("__d.i")).as("in_degree"))

  /** Connected components over an edge frame, treated as UNDIRECTED:
    * `(node, component)` for every node on either side of an edge, where
    * `component` is the minimum node id transitively reachable. Thin
    * facade over the contraction label-propagation engine the dedup
    * family runs ([[Dedup.duplicateClusters]] — full edge frame
    * traversed exactly twice, later sweeps on the geometrically
    * shrinking label graph, bounded driver union-find finish); this
    * entry point gives the same machinery to arbitrary graphs (link
    * graphs, co-citation, entity resolution blocking). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50): DataFrame =
    Dedup.duplicateClusters(
        edges.select(col(srcCol).as("a_id"), col(dstCol).as("b_id")),
        maxIter)
      .select(col("id").as("node"), col("cluster_id").as("component"))

  /** HITS hubs and authorities (Kleinberg 1999) — the two-sided
    * centrality a BIPARTITE graph wants, where PageRank's single score
    * washes out: on a supplier→customer graph, hub score ranks
    * suppliers by the authority of who they serve, authority ranks
    * customers by the hubs who serve them. Power iteration with L1
    * normalization each half-step (`a ← Σ_{u→v} h(u)`, normalize;
    * `h ← Σ_{u→v} a(v)`, normalize) and the family's per-step
    * `roundScale` rounding, so results are partition-order-proof and
    * engine-replicable. Returns `node | hub | authority` for every node
    * (0.0 on a side the node does not participate in).
    *
    * Scale shape: the canonical edge frame is evaluated ONCE and pinned,
    * then re-pinned partitioned by each endpoint so both half-step joins
    * land on a stationary partitioning; each half-step shuffles one
    * node-grain score frame plus a map-side-combined aggregate, is
    * materialized by ONE localCheckpoint action (lineage truncated —
    * plans stay constant-size across iterations), and the L1
    * normalization total rides in-plan as a broadcast one-row frame. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 10,
      roundScale: Int = 12): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(roundScale >= 1 && roundScale <= 15,
      "roundScale must be in [1, 15]")
    // ONE evaluation of the caller's edge plan (r14): nodes/eBySrc/eByDst
    // each used to re-run the upstream join+distinct; pin the canonical
    // frame first and derive everything from the cache
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "edge frame is empty - no graph to score")
    // the uniform seed round(1/n, roundScale) must survive rounding: on
    // a graph with more than 10^roundScale nodes it rounds to 0.0 and
    // the first authority total vanishes with a misleading "no edges"
    // error — refuse up front, naming the actual cause
    require(BigDecimal(1.0 / n)
        .setScale(roundScale, BigDecimal.RoundingMode.HALF_UP) > 0,
      s"hits: roundScale=$roundScale rounds the uniform seed 1/$n to " +
        "zero - raise roundScale above log10(n_nodes)")
    val eBySrc = e.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eByDst = e.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ONE driver action per half-step, with TRUNCATED lineage (r14): the
    // raw contribution aggregate is `localCheckpoint`ed — persist+count
    // kept the full logical tree alive, so every later action re-analyzed
    // a plan that grew per half-step (the committed 4-iter explain was
    // 14.6 MB; driver analysis cost went quadratic in iters — guide §3.3:
    // materialize to cut the plan). The L1 total rides IN-PLAN as a
    // broadcast one-row aggregate over the checkpointed raw (no separate
    // scalar job), with the mass-vanished guard raised in-plan. In-loop
    // normalized frames carry only nodes PRESENT in the raw aggregate —
    // absent nodes score exactly 0.0 and contribute exactly 0.0 through
    // the next join, so dropping them changes no sum; the all-nodes view
    // (zeros included) is assembled once at the end.
    // NOTE: the in-plan raise_error below fires per ROW — if a raw
    // half-step aggregate were ever EMPTY (zero rows), the crossJoin
    // yields zero rows and the guard never fires. That cannot happen
    // here: the upfront `n > 0` + seed-rounding requires guarantee a
    // non-empty first hub frame, every edge endpoint is a node, and a
    // non-empty positive-mass frame keeps each half-step join non-empty.
    // Weakening those requires means re-adding an eager emptiness check.
    def norm(raw: DataFrame, rawCol: String, outCol: String,
        side: String): DataFrame = {
      val tot = broadcast(raw
        .agg(coalesce(sum(rawCol), lit(0.0)).as("__t")))
      raw.crossJoin(tot).select(col("node"),
        when(col("__t") > 0, round(col(rawCol) / col("__t"), roundScale))
          .otherwise(raise_error(lit(
            s"$side mass vanished - the graph has no edges"))
            .cast("double")).as(outCol))
    }
    var hubs = nodes
      .select(col("node"), round(lit(1.0 / n), roundScale).as("h"))
    var auths: DataFrame = null
    (1 to iters).foreach { _ =>
      // authority half-step: in-flowing hub mass, L1-normalized
      val aRaw = Ckpt.pin(eBySrc
        .join(hubs.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node")).agg(sum("h").as("__a")))
      auths = norm(aRaw, "__a", "a", "authority")
      // hub half-step: out-flowing authority mass, L1-normalized
      val hRaw = Ckpt.pin(eByDst
        .join(auths.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node")).agg(sum("a").as("__h")))
      hubs = norm(hRaw, "__h", "h", "hub")
    }
    val out = nodes
      .join(hubs, Seq("node"), "left")
      .join(auths, Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("authority"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // pin the final scores before releasing the loop caches
    eBySrc.unpersist(blocking = false)
    eByDst.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    e.unpersist(blocking = false)
    out
  }

  /** Global triangle count over an edge frame treated as UNDIRECTED and
    * SIMPLE (self-loops dropped, multi-edges collapsed). One row:
    * `n_nodes | n_edges | n_triangles`. Triangle density is the
    * standard cohesion read on entity/blocking graphs (a blocking key
    * whose component is triangle-dense is a real entity; a star is a
    * hub artifact).
    *
    * Algorithm: degree-ordered orientation (Schank & Wagner 2005 /
    * Cohen's MapReduce form) — each undirected edge is oriented from
    * its (degree, id)-smaller endpoint to the larger, so every
    * triangle is counted exactly once at its smallest vertex and the
    * wedge join's fan-out is bounded by the oriented out-degree, which
    * is O(√E) on ANY graph (arboricity bound) — a hub with a million
    * neighbors contributes million-choose-2 wedges under a naive
    * neighbor join, but only its low-degree edges under orientation.
    * Plan: one degree aggregate, one wedge self-join on the oriented
    * src (the only edge-grain shuffle), one semi join of wedges against
    * oriented edges, one count. Everything stays relational; the
    * (degree, id) order rides a struct comparison, never a global
    * rank. */
  def triangleCount(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val (canon, deg, triangles) = triangleFrames(edges, srcCol, dstCol)
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = canon.agg(count(lit(1)).as("n_edges"))
    val nt = triangles.agg(count(lit(1)).as("n_triangles"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(nt))
  }

  /** Shared triangle machinery: the canonical simple-graph edge frame,
    * the simple degrees, and ONE ROW PER TRIANGLE `(apex, w1, w2)`
    * under degree-ordered orientation (each triangle found exactly once
    * at its (degree, id)-smallest vertex; wedge fan-out O(√E) by the
    * arboricity bound). */
  private def triangleFrames(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): (DataFrame, DataFrame, DataFrame) = {
    // canon feeds degrees (two sides), orientation and the closing-edge
    // join — checkpoint it so the caller's edge plan (often a self-join +
    // distinct) runs once, not four times (r14; guide §2.4/§3.3); the
    // degree union rides ONE explode for the same reason
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .pinned()
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("__deg"))
    // orient each edge from its (degree, id)-smaller endpoint
    val withOrd = canon
      .join(deg.select(col("node").as("a"), col("__deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("__deg").as("__db")), "b")
      .select(col("a"), col("b"),
        struct(col("__da").as("d"), col("a").as("n")).as("__oa"),
        struct(col("__db").as("d"), col("b").as("n")).as("__ob"))
    // three consumers (both wedge sides + the closing-edge probe) — pin
    // the oriented frame so the degree joins run once (r14)
    val oriented = withOrd.select(
        when(col("__oa") < col("__ob"), col("a")).otherwise(col("b"))
          .as("src"),
        when(col("__oa") < col("__ob"), col("b")).otherwise(col("a"))
          .as("dst"),
        when(col("__oa") < col("__ob"), col("__ob")).otherwise(col("__oa"))
          .as("__odst"))
      .pinned()
    // wedges at the smallest vertex: two out-neighbors, ordered so each
    // candidate pair appears once; the closing-edge join keeps the apex
    // (closing pairs are unique, so inner == semi on the wedge rows)
    val e1 = oriented.select(col("src"), col("dst").as("w1"),
      col("__odst").as("__o1"))
    val e2 = oriented.select(col("src"), col("dst").as("w2"),
      col("__odst").as("__o2"))
    val wedges = e1.join(e2, Seq("src"))
      .where(col("__o1") < col("__o2"))
      .select(col("src").as("apex"), col("w1"), col("w2"))
    val closing = oriented.select(col("src").as("w1"), col("dst").as("w2"))
    (canon, deg, wedges.join(closing, Seq("w1", "w2")))
  }

  /** Per-node local clustering coefficient over the UNDIRECTED simple
    * graph (Watts & Strogatz 1998): `node | degree | triangles | lcc`
    * with `lcc = 2·t(v) / (deg(v)·(deg(v)−1))` rounded to 6, null when
    * `deg < 2` (undefined — a leaf has no wedge to close). The cohesion
    * signal AT NODE GRAIN: on an entity-resolution blocking graph a
    * node whose neighborhood is triangle-dense sits inside a real
    * entity, a high-degree node with lcc ≈ 0 is a hub artifact
    * stitching unrelated records ([[triangleCount]] says how much of
    * this the graph has; this says WHERE).
    *
    * Scale shape: the same degree-ordered wedge machinery as
    * [[triangleCount]] (each triangle materialized once at its
    * smallest vertex, O(√E) fan-out), then each triangle row credits
    * its three corners through one explode + node-grain count — the
    * only added exchange is node-grain. */
  def localClustering(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val (_, deg, triangles) = triangleFrames(edges, srcCol, dstCol)
    val credits = triangles
      .select(explode(array(col("apex"), col("w1"), col("w2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("__t"))
    deg.join(credits, Seq("node"), "left")
      .select(col("node"),
        col("__deg").as("degree"),
        coalesce(col("__t"), lit(0L)).as("triangles"),
        when(col("__deg") >= 2, round(
          lit(2.0) * coalesce(col("__t"), lit(0L)).cast("double") /
            (col("__deg").cast("double") *
              (col("__deg").cast("double") - 1.0)), 6)).as("lcc"))
  }

  /** Degree assortativity (Newman 2002, the Pearson form over edge
    * endpoint degrees): one row `n_nodes | n_edges | assortativity`,
    * the correlation of `(deg(u), deg(v))` over the SYMMETRIZED simple
    * edge list (each undirected edge contributes both orientations, so
    * the measure is orientation-free), rounded to 6; null on a
    * degree-regular graph (zero variance — correlation undefined).
    * Positive: hubs link hubs (social shape); negative: hubs link
    * leaves (star/broadcast shape — what a blocking-key hub artifact
    * looks like). One degree aggregate + one edge-grain join + one
    * five-sum aggregate; nothing quadratic. */
  def assortativity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val (canon, deg, _) = triangleFrames(edges, srcCol, dstCol)
    val sym = canon.select(col("a"), col("b"))
      .unionAll(canon.select(col("b").as("a"), col("a").as("b")))
    val pairs = sym
      .join(deg.select(col("node").as("a"), col("__deg").as("__dx")), "a")
      .join(deg.select(col("node").as("b"), col("__deg").as("__dy")), "b")
      .select(col("__dx").cast("double").as("x"),
        col("__dy").cast("double").as("y"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = canon.agg(count(lit(1)).as("n_edges"))
    val r = pairs.agg(
        count(lit(1)).cast("double").as("__n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
      .select(round(try_divide(
        col("__n") * col("__sxy") - col("__sx") * col("__sy"),
        sqrt(col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
          sqrt(col("__n") * col("__syy") - col("__sy") * col("__sy"))), 6)
        .as("assortativity"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(r))
  }

  /** Power-iteration PageRank (Brin & Page 1998) with proper dangling-
    * mass redistribution: `pr_{t+1}(v) = (1−d)/N + d·(Σ_{u→v}
    * pr_t(u)/outdeg(u) + D_t/N)` where `D_t` is the rank mass parked on
    * nodes with no out-edges. Returns `node | pagerank` for every node
    * that appears on either side of an edge; ranks sum to 1 (a
    * probability distribution — the dangling term is what keeps it
    * one). Runs a FIXED `iters` iterations rather than a convergence
    * test: deterministic cost, deterministic result, and the usual
    * choice for corpus-weighting where the induced ORDER stabilizes
    * long before the values do.
    *
    * Determinism: ranks are rounded to `roundScale` decimals (HALF_UP,
    * matching Spark's `round`) after every iteration — the lloydRefine
    * discipline — so floating-point summation order across partitions
    * cannot compound into run-to-run drift, and an external engine
    * replaying the same formula lands on the same numbers.
    *
    * Scale shape (the canonical distributed PageRank): edges persist
    * ONCE, pre-partitioned by `src`, so every iteration's
    * contributions join shuffles only the (node, rank) frame — N rows,
    * never E — onto the stationary edge partitioning; the per-
    * destination sum is map-side combined before its node-grain
    * exchange. Per iteration the driver issues two SMALL leaf-rooted
    * actions: the dangling-mass scalar (a filtered sum over the previous
    * CHECKPOINTED rank frame, which carries dangling membership as a
    * flag — no join, no cache dependence) and the next frame's
    * localCheckpoint — nothing edge-grain or node-grain ever
    * collects. Each iteration's rank frame is localCheckpoint'ed, so
    * lineage AND the logical plan stay one step deep instead of `iters`
    * joins tall (persist alone kept the full logical tree alive and
    * made per-action analysis cost quadratic in `iters`). Multi-edges
    * contribute once per edge (multigraph semantics) — dedupe upstream
    * for simple-graph ranks.
    *
    * Lifecycle note (applies to [[weightedPageRank]],
    * [[personalizedPageRank]] and [[hits]] too): the returned frame is
    * backed by ONE checkpointed node-grain result — the loop's helper
    * caches are released before return; checkpointed blocks are
    * reclaimed by the ContextCleaner once the frame is unreferenced.
    * Write it out or accept one node-grain entry per call. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 10,
      damping: Double = 0.85,
      roundScale: Int = 12): DataFrame =
    rankImpl(edges, srcCol, dstCol, None, None, iters, damping, roundScale)

  /** Edge-weighted PageRank: a node's rank flows to each out-neighbor in
    * proportion to the edge weight (`pr(u)·w(u→v)/Σ_out w(u)`) — the
    * form a SIMILARITY graph wants (near-dup edges weighted by Jaccard,
    * citation edges by count): centrality then prefers the strongly-
    * linked member of each cluster, which is exactly the
    * keep-canonical-by-authority signal. Weights must be positive —
    * refused in-plan otherwise (a zero-weight edge is a non-edge; drop
    * it upstream, explicitly). Same iteration shape and rounding
    * discipline as [[pageRank]]; the per-edge `w/Σw` fraction is
    * precomputed ONCE on the pinned edge frame, so iterations stay
    * multiply-only. */
  def weightedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 10,
      damping: Double = 0.85,
      roundScale: Int = 12): DataFrame =
    rankImpl(edges, srcCol, dstCol, Some(weightCol), None, iters, damping,
      roundScale)

  /** Personalized PageRank (Haveliwala 2002): the teleport AND the
    * dangling mass return only to the `resetNodes` set, each member
    * weighted `1/|R|` — rank then measures proximity to R along links
    * rather than global centrality (topic-conditioned corpus weighting:
    * R = the seed docs of a domain, rank = how much of the corpus that
    * domain's random surfer actually visits). `resetNodes` members that
    * are not graph nodes are ignored; the intersection must be
    * non-empty. Uniform PageRank is exactly the special case R = all
    * nodes (differential-pinned in spec). Same iteration shape, same
    * per-iteration rounding discipline, same cost. */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      resetNodes: DataFrame,
      resetCol: String,
      iters: Int = 10,
      damping: Double = 0.85,
      roundScale: Int = 12): DataFrame =
    rankImpl(edges, srcCol, dstCol, None,
      Some(resetNodes.select(col(resetCol).as("node")).distinct()),
      iters, damping, roundScale)

  private def rankImpl(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String],
      reset: Option[DataFrame],
      iters: Int,
      damping: Double,
      roundScale: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(damping >= 0 && damping < 1, "damping must be in [0, 1)")
    require(roundScale >= 1 && roundScale <= 15,
      "roundScale must be in [1, 15]")
    // ONE evaluation of the caller's edge plan (r14): bare/outdeg/eDeg/
    // danglingNodes each re-ran the upstream join+distinct before this
    // pin — derive everything from the cached canonical frame instead
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      case Some(w) =>
        // positive weights or a loud in-plan refusal — a zero/negative
        // weight silently corrupts every downstream fraction
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          when(col(w).cast("double") > 0, col(w).cast("double"))
            .otherwise(raise_error(lit(
              s"weightedPageRank: non-positive weight in '$w' - drop " +
                "non-edges upstream"))).as("__w"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val bare = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // the reset-weight vector: 1/N everywhere (uniform) or 1/|R| on the
    // reset set and 0 elsewhere (personalized) — the loop is identical
    val nodes = (reset match {
      case None => bare.withColumn("__in_r", lit(true))
      case Some(r) => bare.join(r.withColumn("__in_r", lit(true)),
        Seq("node"), "left").na.fill(false, Seq("__in_r"))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "edge frame is empty - no graph to rank")
    val nReset = reset match {
      case None => n
      case Some(_) => nodes.where(col("__in_r")).count()
    }
    require(nReset > 0,
      "resetNodes shares no member with the graph - nothing to teleport to")
    val rw = when(col("__in_r"), lit(1.0 / nReset)).otherwise(lit(0.0))
    val outdeg = weightCol match {
      case None => e.groupBy("src")
        .agg(count(lit(1)).cast("double").as("__outdeg"))
      case Some(_) => e.groupBy("src")
        .agg(sum(col("__w")).as("__outdeg"))
    }
    // the loop-invariant frames, built ONCE: degree-annotated edges
    // pinned on the src partitioning every iteration joins against
    // (weighted: the per-edge w/Σw fraction precomputed, so iterations
    // stay multiply-only), and the (static) set of dangling nodes
    val eDeg = (weightCol match {
      case None => e.join(outdeg, "src")
        .select(col("src"), col("dst"), col("__outdeg"))
      case Some(_) => e.join(outdeg, "src")
        .select(col("src"), col("dst"),
          (col("__w") / col("__outdeg")).as("__wfrac"))
    }).repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dangling membership rides the NODE frame as a flag (r14): the
    // previous shape — a persisted dangling-node set semi-joined against
    // the rank frame every iteration — made the per-iteration scalar
    // depend on cache state and join machinery; a flag on the
    // checkpointed rank frame makes it a leaf-rooted column scan
    val nodesD = nodes
      .join(outdeg.select(col("src").as("node"), lit(true).as("__has_out")),
        Seq("node"), "left")
      .select(col("node"), col("__in_r"),
        col("__has_out").isNull.as("__dang"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Per-iteration rank frames are materialized (localCheckpoint by
    // default; reliable DFS checkpoint under
    // `spark.graft.reliableCheckpointDir`), not persisted: persist+count
    // kept the full logical tree alive, so every later action re-analyzed
    // a plan that grew with the iteration count (driver analysis went
    // quadratic in iters — guide §3.3: materialize to cut the plan).
    // ONE driver action per iteration (r15): the dangling-mass scalar
    // rides IN-PLAN as a broadcast one-row aggregate over the previous
    // checkpointed leaf (the hits `norm()` pattern) instead of a separate
    // per-iteration `.head()` job — same aggregate over the same frame,
    // so the scalar (and every rank) is bit-identical.
    var ranks = Ckpt.pin(nodesD
      .select(col("node"), col("__in_r"), col("__dang"),
        round(rw, roundScale).as("pr")))

    val rankDebug = sys.env.contains("GRAFT_RANK_DEBUG")
    (1 to iters).foreach { it =>
      val t0 = System.nanoTime()
      // dangling mass: rank parked on nodes with no out-edges (one-row
      // broadcast aggregate off the checkpointed frame — leaf-rooted,
      // no cache dependence, evaluated by the checkpoint action below)
      val dang = broadcast(ranks.where(col("__dang"))
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm")))
      val perEdge =
        if (weightCol.isDefined) col("pr") * col("__wfrac")
        else col("pr") / col("__outdeg")
      val contribs = eDeg
        .join(ranks.select("node", "pr"), eDeg("src") === col("node"))
        .select(col("dst").as("node"), perEdge.as("__c"))
        .groupBy("node").agg(sum("__c").as("__contrib"))
      ranks = Ckpt.pin(nodesD.join(contribs, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"), col("__in_r"), col("__dang"),
          round(lit(1.0 - damping) * rw + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dm") * rw),
            roundScale).as("pr")))
      if (rankDebug)
        System.err.println(
          f"[rankdbg] iter $it ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // the final rank frame is materialized; the helpers can go
    // (checkpointed per-iteration blocks are reclaimed by the
    // ContextCleaner once unreferenced — the duplicateClusters lifecycle)
    eDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    nodesD.unpersist(blocking = false)
    e.unpersist(blocking = false)
    ranks.select(col("node"), col("pr").as("pagerank"))
  }

  /** Index-pruned k-hop neighborhood (egonet) expansion over an INDEXED
    * edge table — the graph tier's serving-shape query, the
    * [[graft.Index.searchText]] pattern applied to BFS: each hop
    * locates, through the src/dst indexes, ONLY the edge files that can
    * contain the current frontier's keys, reads those, and expands one
    * step. Returns `node | hop` with `hop` the minimum BFS distance
    * from the seed set (seeds themselves at hop 0, deduped; nodes
    * first reached at distance > `hops` are absent). `direction`:
    * `out` follows src→dst, `in` follows dst→src, `both` treats edges
    * as undirected (probing BOTH endpoint indexes per hop and unioning
    * the located files).
    *
    * Scale shape: an egonet is seed-local by definition, so this is a
    * driver-paced loop over BOUNDED frontiers — the bounded-collect
    * posture of `probeValueLimit`, enforced: the visited set may never
    * exceed `maxFrontier` nodes (fail fast naming the relational
    * alternative — on a frontier that covers the graph you want
    * [[connectedComponents]], not an egonet). What makes it a 100 TB
    * shape is the per-hop read: a 3-hop expansion from 50 seeds
    * touches only the files whose index rows contain frontier keys,
    * never the corpus — the located<total pruning is asserted in the
    * drive and spec. Requires an index on the probed endpoint
    * column(s) (`out` → srcCol, `in` → dstCol, `both` → both). */
  /** `(filesLocated, filesTotal)` per hop of the most recent
    * [[neighborhood]]/[[sampleNeighbors]]/[[induceEdges]] call ON THIS
    * THREAD — the pruning-evidence surface (the `IndexJoin.lastMetrics`
    * pattern): specs and the drive assert located < total on the hops
    * where the frontier is key-local. Thread-local, not JVM-global, so
    * concurrent serving calls (the Lake's multi-threaded prebuild
    * pattern, parallel bench runs) cannot clobber each other's
    * evidence; read it from the thread that made the call. */
  private val probesTl = new ThreadLocal[Seq[(Int, Int)]] {
    override def initialValue(): Seq[(Int, Int)] = Nil
  }
  def lastNeighborhoodProbes: Seq[(Int, Int)] = probesTl.get()

  def neighborhood(
      index: graft.Index,
      srcCol: String,
      dstCol: String,
      seeds: Seq[Any],
      hops: Int,
      direction: String = "out",
      maxFrontier: Int = 10000): DataFrame = {
    require(hops >= 0, "hops must be non-negative")
    require(Seq("out", "in", "both").contains(direction),
      s"direction must be one of out/in/both, got '$direction'")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(maxFrontier > 0, "maxFrontier must be positive")
    val spark = index.spark
    // min-hop BFS bookkeeping; LinkedHashMap keeps discovery order out
    // of the result (callers sort), but makes reruns deterministic
    val visited = scala.collection.mutable.LinkedHashMap[Any, Int]()
    seeds.distinct.foreach(s => visited(s) = 0)
    require(visited.size <= maxFrontier,
      s"neighborhood: ${visited.size} seeds exceed maxFrontier=" +
        s"$maxFrontier")
    var frontier: Seq[Any] = visited.keys.toSeq
    var h = 0
    val probeStats = Seq.newBuilder[(Int, Int)]
    val totalFiles = index.files.size
    while (h < hops && frontier.nonEmpty) {
      h += 1
      val probeCols = direction match {
        case "out" => Seq(srcCol)
        case "in" => Seq(dstCol)
        case "both" => Seq(srcCol, dstCol)
      }
      // OR-semantics across endpoints: one locate per probed column,
      // files unioned (a Map probe would AND-intersect them)
      val located = probeCols
        .flatMap(c => index.locateFiles(Map(c -> frontier)))
        .distinct
      probeStats += ((located.size, totalFiles))
      if (located.isEmpty) frontier = Nil
      else {
        val edges = index.readFiles(located)
        // frontier membership rides the probe-shape discipline: within
        // `probeValueLimit` an `isin` literal list, past it a broadcast
        // sorted-array membership expression — a 10^4-literal isin tree
        // bloats every task's serialized plan (r12 verdict item #2)
        def fPred(c: String) = IndexProbe.memberFilter(spark,
          edges.schema(c).dataType, frontier)(col(c))
        val next = (direction match {
          case "out" =>
            edges.where(fPred(srcCol))
              .select(col(dstCol).as("__n"))
          case "in" =>
            edges.where(fPred(dstCol))
              .select(col(srcCol).as("__n"))
          case "both" =>
            edges.where(fPred(srcCol))
              .select(col(dstCol).as("__n"))
              .unionAll(edges.where(fPred(dstCol))
                .select(col(srcCol).as("__n")))
        }).where(col("__n").isNotNull).distinct()
          .collect().map(_.get(0)).toSeq
        val fresh = next.filterNot(visited.contains)
        require(visited.size + fresh.size <= maxFrontier,
          s"neighborhood: frontier grew past maxFrontier=$maxFrontier " +
            s"at hop $h (${visited.size} visited + ${fresh.size} new) - " +
            "this seed set is not local; use connectedComponents or a " +
            "relational BFS instead, or raise maxFrontier")
        fresh.foreach(n => visited(n) = h)
        frontier = fresh
      }
    }
    probesTl.set(probeStats.result())
    // node type from the read path's schema (covers computed columns
    // too — the empty-read branch has full schema parity). Under `both`
    // the node column mixes src-typed and dst-typed values, so the
    // endpoint types must agree (the sampleNeighbors discipline) —
    // otherwise Row encoding fails downstream with an opaque error
    val readSchema = index.readFiles(Seq.empty).schema
    def typeFor(name: String) = readSchema.find(_.name == name)
      .map(_.dataType)
    if (direction == "both")
      (typeFor(srcCol), typeFor(dstCol)) match {
        case (Some(st), Some(dt)) => require(st == dt,
          s"neighborhood: direction 'both' needs matching endpoint " +
            s"types, got $st vs $dt")
        case _ => ()
      }
    val nodeType = typeFor(srcCol)
      .orElse(typeFor(dstCol))
      .getOrElse(throw new IllegalArgumentException(
        s"neighborhood: neither '$srcCol' nor '$dstCol' is in the " +
          "indexed table's schema"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("hop",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val rows = visited.toSeq.map { case (n, d) =>
      org.apache.spark.sql.Row(n, d)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** GraphSAGE-style deterministic fan-out neighbor sampling over an
    * INDEXED edge table (Hamilton et al. 2017) — the minibatch-
    * construction step of GNN training-data prep, which at corpus scale
    * is a SAMPLING SERVICE, not a full-graph pass: for each hop `h`,
    * every frontier node keeps at most `fanouts(h-1)` of its distinct
    * neighbors, chosen by a SEEDED deterministic rank (md5 of
    * `"u:v:seed"`, ascending) so the same minibatch is bit-reproducible
    * across replays, engines, and partitionings — the property that
    * makes sampled training data auditable. Multi-edges collapse before
    * sampling (the sample is over the neighbor SET).
    *
    * With `weightCol` set, the per-node draw becomes weighted sampling
    * WITHOUT replacement on the (accumulated, positive) edge weights —
    * the Gumbel-top-f trick in log space (`key = ln w − ln(−ln u)`,
    * `u` hash-derived from `"seed#u#v"`, the [[Dsir.resample]]
    * machinery), still fully deterministic and engine-replicable.
    * Heavier edges are proportionally likelier to be kept — the
    * importance-sampling form GNN samplers use on co-occurrence and
    * similarity graphs. Non-positive weights raise in-plan.
    *
    * Returns the sampled edge frame `hop | node | neighbor` (hop
    * 1-based; `node` is always the FRONTIER side of the edge, whatever
    * the stored orientation — the adjacency a GNN layer aggregates
    * over). The next
    * frontier is the sampled neighbors not yet visited, so the node
    * universe grows at most `Σ_h Π_{i<=h} fanouts(i)` from each seed —
    * fan-out is what bounds the hop-k explosion that makes unsampled
    * k-hop expansion intractable on power-law graphs.
    *
    * Scale shape: [[neighborhood]]'s serving posture — per-hop reads
    * locate only the files whose src/dst indexes can contain frontier
    * keys; the rank window partitions BY FRONTIER NODE over the
    * already-pruned candidate edges (never the corpus); the driver
    * holds only the bounded sample (≤ maxFrontier nodes, fail-fast).
    * Ref parity note: no reference equivalent; extends the graph tier
    * per the training-data-ops mandate (GNN minibatch prep). */
  def sampleNeighbors(
      index: graft.Index,
      srcCol: String,
      dstCol: String,
      seeds: Seq[Any],
      fanouts: Seq[Int],
      samplingSeed: Long = 42L,
      direction: String = "out",
      maxFrontier: Int = 10000,
      weightCol: Option[String] = None): DataFrame = {
    require(fanouts.nonEmpty, "fanouts must be non-empty (one per hop)")
    require(fanouts.forall(_ > 0), "every fanout must be positive")
    require(Seq("out", "in", "both").contains(direction),
      s"direction must be one of out/in/both, got '$direction'")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(maxFrontier > 0, "maxFrontier must be positive")
    val spark = index.spark
    val visited = scala.collection.mutable.LinkedHashSet[Any](
      seeds.distinct: _*)
    require(visited.size <= maxFrontier,
      s"sampleNeighbors: ${visited.size} seeds exceed maxFrontier=" +
        s"$maxFrontier")
    var frontier: Seq[Any] = visited.toSeq
    val sampled = Seq.newBuilder[(Int, Any, Any)]
    val probeStats = Seq.newBuilder[(Int, Int)]
    val totalFiles = index.files.size
    fanouts.zipWithIndex.foreach { case (f, i) =>
      val h = i + 1
      if (frontier.nonEmpty) {
        val probeCols = direction match {
          case "out" => Seq(srcCol)
          case "in" => Seq(dstCol)
          case "both" => Seq(srcCol, dstCol)
        }
        val located = probeCols
          .flatMap(c => index.locateFiles(Map(c -> frontier)))
          .distinct
        probeStats += ((located.size, totalFiles))
        if (located.isEmpty) frontier = Nil
        else {
          val edges = index.readFiles(located)
          // same probe-shape discipline as [[neighborhood]]: literal
          // isin within the cap, broadcast membership past it
          def fPred(c: String) = IndexProbe.memberFilter(spark,
            edges.schema(c).dataType, frontier)(col(c))
          val wSel = weightCol.map(c =>
            when(col(c).cast("double") > 0, col(c).cast("double"))
              .otherwise(raise_error(lit(
                s"sampleNeighbors: non-positive weight in '$c' - drop " +
                  "non-edges upstream")).cast("double")).as("__w")).toSeq
          // frontier-node u, neighbor v — both orientations under `both`
          val raw = (direction match {
            case "out" =>
              edges.where(fPred(srcCol))
                .select(col(srcCol).as("__u") +: col(dstCol).as("__v")
                  +: wSel: _*)
            case "in" =>
              edges.where(fPred(dstCol))
                .select(col(dstCol).as("__u") +: col(srcCol).as("__v")
                  +: wSel: _*)
            case "both" =>
              edges.where(fPred(srcCol))
                .select(col(srcCol).as("__u") +: col(dstCol).as("__v")
                  +: wSel: _*)
                .unionAll(edges.where(fPred(dstCol))
                  .select(col(dstCol).as("__u") +: col(srcCol).as("__v")
                    +: wSel: _*))
          }).where(col("__v").isNotNull)
          // multi-edges collapse: weights ACCUMULATE (a neighbor stored
          // on many parallel edges is proportionally likelier); the
          // unweighted sample is over the neighbor SET
          val cand =
            if (weightCol.isDefined)
              raw.groupBy(col("__u"), col("__v"))
                .agg(sum(col("__w")).as("__w"))
            else raw.distinct()
          val rankKey = fanoutRank(weightCol.isDefined, samplingSeed)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__u"))
            .orderBy(rankKey, col("__v").asc)
          val take = cand
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") <= f)
            .select(col("__u"), col("__v"))
            .collect()
          take.foreach(r => sampled += ((h, r.get(0), r.get(1))))
          val fresh = take.map(_.get(1)).distinct
            .filterNot(visited.contains)
          require(visited.size + fresh.size <= maxFrontier,
            s"sampleNeighbors: sampled universe past maxFrontier=" +
              s"$maxFrontier at hop $h - lower the fanouts or raise " +
              "maxFrontier")
          fresh.foreach(visited.add)
          frontier = fresh
        }
      }
    }
    probesTl.set(probeStats.result())
    val readSchema = index.readFiles(Seq.empty).schema
    def typeOf(name: String) = readSchema.find(_.name == name)
      .map(_.dataType).getOrElse(throw new IllegalArgumentException(
        s"sampleNeighbors: '$name' is not in the indexed table's schema"))
    // node = frontier side: src-typed under out, dst-typed under in;
    // `both` mixes orientations, so the endpoint types must agree
    val (nodeType, neighborType) = direction match {
      case "out" => (typeOf(srcCol), typeOf(dstCol))
      case "in" => (typeOf(dstCol), typeOf(srcCol))
      case "both" =>
        require(typeOf(srcCol) == typeOf(dstCol),
          s"sampleNeighbors: direction 'both' needs matching endpoint " +
            s"types, got ${typeOf(srcCol)} vs ${typeOf(dstCol)}")
        (typeOf(srcCol), typeOf(dstCol))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hop",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("neighbor", neighborType)))
    val rows = sampled.result().map { case (h, u, v) =>
      org.apache.spark.sql.Row(h, u, v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The seeded deterministic rank the fan-out samplers share, over the
    * per-hop candidate frame `(__u, __v[, __w])`. Unweighted:
    * md5("u:v:seed") ascending. Weighted: Gumbel-top-f on ln(w) with the
    * SAME hash-derived uniform the DSIR resampler uses — weighted
    * sampling without replacement in log space, and engine-replicable
    * (q_dsir_select pins the md5→uniform→ln chain's float parity in
    * DuckDB). */
  private def fanoutRank(
      weighted: Boolean,
      samplingSeed: Long): org.apache.spark.sql.Column =
    if (weighted) {
      val u = (conv(substring(md5(concat_ws("#",
        lit(samplingSeed.toString), col("__u").cast("string"),
        col("__v").cast("string"))), 1, 8), 16, 10)
        .cast("long") + lit(1L)).cast("double") /
        lit(4294967297.0)
      (log(col("__w")) - log(-log(u))).desc
    } else
      md5(concat(col("__u").cast("string"), lit(":"),
        col("__v").cast("string"), lit(":"),
        lit(samplingSeed.toString))).asc

  /** Heterogeneous (metapath) fan-out sampling over a TYPED indexed edge
    * table — the PyG `NeighborLoader(input_nodes,
    * num_neighbors={edge_type: n})` shape for heterogeneous GNNs: hop
    * `h` follows ONLY edges whose `typeCol` equals `path(h-1)._1`
    * (src → dst orientation — a metapath names each step's edge type,
    * e.g. customer→order then order→supplier), keeping at most
    * `path(h-1)._2` distinct neighbors per frontier node under the same
    * seeded deterministic rank as [[sampleNeighbors]] (md5 unweighted,
    * Gumbel-top-f on accumulated positive weights with `weightCol`) —
    * bit-reproducible across replays, engines, and partitionings.
    * Returns `hop | etype | node | neighbor` (hop 1-based, `node` the
    * frontier side).
    *
    * Scale shape: the [[neighborhood]] serving posture — each hop's read
    * locates only the files whose src index can contain frontier keys.
    * On a lake banded by source entity WITHIN each edge type (the
    * production layout for typed edges), the frontier's keys live in one
    * type's namespace, so the src probe prunes per type for free — no
    * per-type index machinery needed; the residual `typeCol` equality is
    * pushed to the pruned parquet scan. Frontier membership rides the
    * probe-shape discipline (literal `isin` within `probeValueLimit`,
    * broadcast membership past it); the sampled universe is bounded by
    * `maxFrontier`, fail-fast. */
  def sampleMetapath(
      index: graft.Index,
      srcCol: String,
      dstCol: String,
      typeCol: String,
      seeds: Seq[Any],
      path: Seq[(String, Int)],
      samplingSeed: Long = 42L,
      maxFrontier: Int = 10000,
      weightCol: Option[String] = None): DataFrame = {
    require(path.nonEmpty, "path must be non-empty (one (etype, fanout) " +
      "per hop)")
    require(path.forall(_._2 > 0), "every fanout must be positive")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(maxFrontier > 0, "maxFrontier must be positive")
    val spark = index.spark
    // schema discipline checked UP FRONT (fail fast, not after hops ran):
    // hop h's frontier holds hop h-1's dst values, so across hops the
    // node column mixes both endpoint positions — types must agree; the
    // edge-type column must be a string (an ANSI-mode numeric comparison
    // against the type name would otherwise fail mid-hop, opaquely)
    val readSchema = index.readFiles(Seq.empty).schema
    def typeOf(name: String) = readSchema.find(_.name == name)
      .map(_.dataType).getOrElse(throw new IllegalArgumentException(
        s"sampleMetapath: '$name' is not in the indexed table's schema"))
    require(typeOf(srcCol) == typeOf(dstCol),
      s"sampleMetapath: endpoint types must match across hops, got " +
        s"${typeOf(srcCol)} vs ${typeOf(dstCol)}")
    require(typeOf(typeCol) ==
      org.apache.spark.sql.types.StringType,
      s"sampleMetapath: '$typeCol' must be a string edge-type column, " +
        s"got ${typeOf(typeCol)}")
    val visited = scala.collection.mutable.LinkedHashSet[Any](
      seeds.distinct: _*)
    require(visited.size <= maxFrontier,
      s"sampleMetapath: ${visited.size} seeds exceed maxFrontier=" +
        s"$maxFrontier")
    var frontier: Seq[Any] = visited.toSeq
    val sampled = Seq.newBuilder[(Int, String, Any, Any)]
    val probeStats = Seq.newBuilder[(Int, Int)]
    val totalFiles = index.files.size
    path.zipWithIndex.foreach { case ((etype, f), i) =>
      val h = i + 1
      if (frontier.nonEmpty) {
        val located = index.locateFiles(Map(srcCol -> frontier))
        probeStats += ((located.size, totalFiles))
        if (located.isEmpty) frontier = Nil
        else {
          val edges = index.readFiles(located)
            .where(col(typeCol) === lit(etype))
          val fPred = IndexProbe.memberFilter(spark,
            edges.schema(srcCol).dataType, frontier)(col(srcCol))
          val wSel = weightCol.map(c =>
            when(col(c).cast("double") > 0, col(c).cast("double"))
              .otherwise(raise_error(lit(
                s"sampleMetapath: non-positive weight in '$c' - drop " +
                  "non-edges upstream")).cast("double")).as("__w")).toSeq
          val raw = edges.where(fPred)
            .select(col(srcCol).as("__u") +: col(dstCol).as("__v")
              +: wSel: _*)
            .where(col("__v").isNotNull)
          val cand =
            if (weightCol.isDefined)
              raw.groupBy(col("__u"), col("__v"))
                .agg(sum(col("__w")).as("__w"))
            else raw.distinct()
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("__u"))
            .orderBy(fanoutRank(weightCol.isDefined, samplingSeed),
              col("__v").asc)
          val take = cand
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") <= f)
            .select(col("__u"), col("__v"))
            .collect()
          take.foreach(r => sampled += ((h, etype, r.get(0), r.get(1))))
          val fresh = take.map(_.get(1)).distinct
            .filterNot(visited.contains)
          require(visited.size + fresh.size <= maxFrontier,
            s"sampleMetapath: sampled universe past maxFrontier=" +
              s"$maxFrontier at hop $h - lower the fanouts or raise " +
              "maxFrontier")
          fresh.foreach(visited.add)
          frontier = fresh
        }
      }
    }
    probesTl.set(probeStats.result())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hop",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("etype",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("node", typeOf(srcCol)),
      org.apache.spark.sql.types.StructField("neighbor", typeOf(dstCol))))
    val rows = sampled.result().map { case (h, t, u, v) =>
      org.apache.spark.sql.Row(h, t, u, v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Synchronous label propagation over the UNDIRECTED simple graph
    * (Raghavan et al. 2007) — community detection at corpus scale
    * (near-dup neighborhoods, domain clusters on a link graph), where
    * [[connectedComponents]] is too coarse (one giant component) and
    * modularity methods too expensive. Every node starts labeled with
    * itself; each sweep RELABELS every node with the label most frequent
    * among its neighbors, ties broken by SMALLEST label — fully
    * deterministic, no RNG, so a fixed `iters` gives a replayable result
    * (the classic sync-LPA caveat applies: bipartite structures can
    * oscillate between sweeps, which a fixed iteration count simply
    * freezes; run an odd/even pair downstream if oscillation matters).
    * Returns `node | label`.
    *
    * Scale shape: the symmetrized adjacency persists ONCE partitioned by
    * `src`; each sweep is one edge-grain vote count (map-side combined
    * into (node, label) grain) + one node-grain argmax — the
    * `min(struct(-count, label))` trick keeps the tie-break inside a
    * single codegen'd aggregate, no window. One driver count per sweep
    * pins lineage depth. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 100, "iters must be in [1, 100]")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    // symmetrize via ONE explode, not unionAll of two selects — the union
    // evaluated the caller's (often expensive) canonical plan twice (r14);
    // localCheckpoint truncates the lineage so per-sweep actions don't
    // re-analyze the upstream plan (guide §3.3)
    val sym = Ckpt.pin(canon
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .repartition(col("src")))
    var labels = Ckpt.pin(sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    (1 to iters).foreach { _ =>
      val votes = sym
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
      labels = Ckpt.pin(votes
        .groupBy("node")
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
          .as("__m"))
        .select(col("node"), col("__m.l").as("label"))
      ) // one driver action per sweep, one-deep lineage
    }
    labels
  }

  /** Newman modularity (Newman & Girvan 2004) of a node labeling over
    * the UNDIRECTED simple graph: one row
    * `n_communities | modularity` with `Q = Σ_c (e_c/m − (d_c/2m)²)`
    * (e_c = intra-community edges, d_c = community degree sum, m =
    * total edges), rounded to 6 — the quality scalar that grades a
    * [[labelPropagation]] / [[connectedComponents]] partition (Q near 0:
    * no better than random; Q ≳ 0.3: real community structure). The
    * `labels` frame must cover every edge endpoint — a missing label
    * raises IN-PLAN naming the node column (silently dropping unlabeled
    * edges would inflate Q).
    *
    * Scale shape: two label joins on the canonical edge frame (the only
    * edge-grain work), then everything collapses to community grain —
    * one intra-edge count, one degree sum, one Σ over communities;
    * `m` rides a broadcast one-row frame. */
  def modularity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      labels: DataFrame,
      nodeCol: String = "node",
      labelCol: String = "label"): DataFrame = {
    require(labels.columns.contains(nodeCol) &&
      labels.columns.contains(labelCol),
      s"modularity: labels frame needs columns '$nodeCol' and " +
        s"'$labelCol' (got ${labels.columns.mkString(", ")})")
    // the canonical simple-graph frame feeds FOUR consumers (label join,
    // m, both degree sides) — checkpoint it so the caller's edge plan
    // runs once, not four times (r14; guide §2.4/§3.3)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .pinned()
    val lab0 = labels.select(col(nodeCol).as("__n"), col(labelCol).as("__l"))
      .distinct()
    val lt = lab0.schema("__l").dataType
    // A node carrying TWO different labels would silently ride both
    // label joins (duplicating its edges and skewing Q) — guard
    // uniqueness in-plan, same discipline as the unlabeled-endpoint
    // raise below. lab0 is already (node,label)-distinct, so a plain
    // count per node IS the distinct-label count.
    val lab = lab0.groupBy("__n")
      .agg(count(col("__l")).as("__nl"), max(col("__l")).as("__ml"))
      .select(col("__n"),
        when(col("__nl") > lit(1), raise_error(lit(
          s"modularity: a node has more than one distinct '$labelCol' - " +
            "labels must be unique per node (a duplicate would " +
            "double-count its edges and skew Q")).cast(lt))
          .otherwise(col("__ml")).as("__l"))
    def labFor(end: String) = lab
      .select(col("__n").as(end), col("__l").as(s"__l$end"))
    val withL = canon
      .join(labFor("a"), Seq("a"), "left")
      .join(labFor("b"), Seq("b"), "left")
      .select(
        coalesce(col("__la"), raise_error(lit(
          s"modularity: an edge endpoint has no label in '$nodeCol' - " +
            "label every edge node (unlabeled edges would inflate Q)"))
          .cast(lt)).as("__la"),
        coalesce(col("__lb"), raise_error(lit(
          s"modularity: an edge endpoint has no label in '$nodeCol' - " +
            "label every edge node (unlabeled edges would inflate Q)"))
          .cast(lt)).as("__lb"))
    val m1 = canon.agg(count(lit(1)).cast("double").as("__m"))
    val ec = withL.where(col("__la") === col("__lb"))
      .groupBy(col("__la").as("__c"))
      .agg(count(lit(1)).cast("double").as("__ec"))
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("__n"))
      .groupBy("__n").agg(count(lit(1)).cast("double").as("__d"))
    val dc = deg.join(lab, Seq("__n"))
      .groupBy(col("__l").as("__c")).agg(sum("__d").as("__dc"))
    val terms = dc.join(ec, Seq("__c"), "left")
      .crossJoin(broadcast(m1))
      .select((coalesce(col("__ec"), lit(0.0)) / col("__m") -
        (col("__dc") / (lit(2.0) * col("__m"))) *
          (col("__dc") / (lit(2.0) * col("__m")))).as("__t"))
    val nc = dc.agg(count(lit(1)).as("n_communities"))
    val q = terms.agg(round(sum("__t"), 6).as("modularity"))
    nc.crossJoin(broadcast(q))
  }

  /** DISTRIBUTED multi-source BFS over an edge frame: `node | hop` with
    * `hop` the minimum distance from the seed set, computed entirely in
    * node-grain DataFrame iterations — the relational alternative the
    * serving loops' fail-fasts point to when a frontier is NOT seed-
    * local ([[neighborhood]] bounds its driver-paced frontier by
    * `maxFrontier`; this never collects a frontier at all). Seeds read
    * hop 0 (graph membership not required — an off-graph seed is its own
    * hop-0 island); expansion stops at `maxHops` or when the frontier
    * empties, whichever is first.
    *
    * Scale shape: the (deduped, direction-resolved) adjacency persists
    * ONCE partitioned by `src`; each hop joins the node-grain frontier
    * against that stationary partitioning, anti-joins the visited set
    * (node-grain), and the driver sees ONE scalar (the frontier count —
    * the termination test). Visited/frontier frames persist one hop deep
    * (the pagerank lifecycle discipline). */
  def hopDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int,
      direction: String = "out"): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    require(Seq("out", "in", "both").contains(direction),
      s"direction must be one of out/in/both, got '$direction'")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val rev = edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))
    val adj = (direction match {
      case "out" => fwd
      case "in" => rev
      case "both" => fwd.unionAll(rev)
    }).where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-hop frontier/distance frames are localCheckpoint'ed (r14):
    // persist+count kept the hop chain's logical plan alive, so each
    // hop's actions re-analyzed a growing tree (guide §3.3); the
    // checkpoint is also the per-hop materializing action
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .where(col("node").isNotNull)
      .withColumn("hop", lit(0))
      .pinned()
    var frontier = dist
    var h = 0
    var frontierSize = frontier.count()
    while (h < maxHops && frontierSize > 0) {
      h += 1
      val hh = h
      val next = adj
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hop", lit(hh))
        .pinned()
      frontierSize = next.count() // ONE driver scalar per hop
      dist = dist.unionAll(next).pinned()
      frontier = next
    }
    adj.unpersist(blocking = false)
    dist
  }

  /** Skip-gram training-pair extraction over a walk corpus
    * ([[randomWalks]]' `start | walk | step | node` shape) — the
    * DeepWalk pipeline's second half: every ordered pair of nodes at
    * step distance 1..`window` within the SAME walk becomes
    * `center | context | offset` (offset = context step − center step,
    * signed; each unordered co-occurrence yields both directions, the
    * skip-gram convention). Aggregate `count(*)` downstream for the
    * (center, context) frequency table an embedding trainer consumes.
    * One self-join keyed on (start, walk) — per-walk candidate fan-out
    * is `walkLength × 2·window`, so the join is walk-grain, never
    * corpus-quadratic. */
  def walkSkipGrams(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "window must be at least 1")
    Seq("start", "walk", "step", "node").foreach(c =>
      require(walks.columns.contains(c),
        s"walkSkipGrams expects a randomWalks-shaped frame with column " +
          s"'$c' (got ${walks.columns.mkString(", ")})"))
    val a = walks.select(col("start"), col("walk"),
      col("step").as("__sa"), col("node").as("center"))
    val b = walks.select(col("start"), col("walk"),
      col("step").as("__sb"), col("node").as("context"))
    a.join(b, Seq("start", "walk"))
      .where(col("__sb") =!= col("__sa") &&
        abs(col("__sb") - col("__sa")) <= window)
      .select(col("center"), col("context"),
        (col("__sb") - col("__sa")).as("offset"))
  }

  /** PPMI weighting of a skip-gram co-occurrence frame ([[walkSkipGrams]]
    * output, or any `center | context` pair frame) — the association
    * statistic between raw co-occurrence counts and an embedding:
    * `PPMI(c, x) = max(0, ln(n(c,x)·N / (n(c,·)·n(·,x))))` downweights
    * pairs whose co-occurrence is explained by marginal frequency alone
    * (hub nodes co-occur with everything; PPMI ≈ 0 there), and the
    * PPMI matrix's factorization IS skip-gram-with-negative-sampling's
    * implicit objective (Levy & Goldberg 2014) — so this frame is the
    * closed-form embedding input a trainer-less pipeline can ship.
    * Returns `center | context | n_pairs | ppmi` (round-6).
    *
    * Scale shape: one pair-grain count aggregate, two node-grain
    * marginal sums DERIVED from it (Catalyst reuses the shared
    * aggregate exchange across the three consumers), pair-grain joins
    * keyed on each marginal, total via a broadcast one-row frame —
    * nothing wider than the pair frame itself ever shuffles. */
  def walkPmi(
      pairs: DataFrame,
      centerCol: String = "center",
      contextCol: String = "context"): DataFrame = {
    Seq(centerCol, contextCol).foreach(c =>
      require(pairs.columns.contains(c),
        s"walkPmi: missing column '$c' (got " +
          s"${pairs.columns.mkString(", ")})"))
    val agg = pairs
      .select(col(centerCol).as("center"), col(contextCol).as("context"))
      .where(col("center").isNotNull && col("context").isNotNull)
      .groupBy("center", "context")
      .agg(count(lit(1)).cast("double").as("__n"))
    val nc = agg.groupBy("center").agg(sum("__n").as("__cn"))
    val nx = agg.groupBy("context").agg(sum("__n").as("__xn"))
    val tot = agg.agg(sum("__n").as("__t"))
    agg.join(nc, "center").join(nx, "context")
      .crossJoin(broadcast(tot))
      .select(col("center"), col("context"),
        col("__n").cast("long").as("n_pairs"),
        round(greatest(lit(0.0),
          log(col("__n") * col("__t") / (col("__cn") * col("__xn")))), 6)
          .as("ppmi"))
  }

  /** Deterministic random-walk corpus over an edge frame — DeepWalk /
    * node2vec-style sequence generation (Perozzi et al. 2014): at corpus
    * scale the walk corpus IS training data (skip-gram windows over node
    * sequences train the embedding), so the walks must be reproducible,
    * auditable artifacts, not RNG noise. Every distinct source node
    * starts `walksPerNode` walks of `walkLength` steps; a walker at node
    * `u` on step `s` of walk `w` moves to the out-neighbor `v`
    * minimizing `md5("u:v:seed:w:s")` — a seeded hash draw, uniform over
    * the (deduped) neighbor set, bit-reproducible across replays,
    * partitionings, and engines (the fan-out samplers' discipline,
    * replayed term-for-term by the DuckDB oracle). A walker reaching a
    * SINK (no out-edges) simply ends — truncated walks are the standard
    * DeepWalk behavior on directed graphs. Walk an undirected graph by
    * symmetrizing the edge frame upstream. With `weightCol` the per-step
    * draw becomes the Gumbel-max one-sample weighted choice on the
    * (accumulated, positive) edge weights — heavier edges
    * proportionally likelier, same determinism. Returns
    * `start | walk | step | node` (step 0 = the start node itself).
    *
    * Scale shape: the deduped adjacency persists ONCE, partitioned by
    * `src`; each step joins the node-grain walker frame against that
    * stationary partitioning and reduces candidates with ONE map-side-
    * combined `min(struct(hash, neighbor))` aggregate — per step the
    * exchange is walker-grain (≤ nodes × walksPerNode rows), the
    * candidate fan-out is bounded by out-degree, and the driver sees one
    * count per step (the lineage-depth pin). Nothing ever collects. */
  def randomWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walkLength: Int,
      walksPerNode: Int = 1,
      samplingSeed: Long = 42L,
      weightCol: Option[String] = None): DataFrame = {
    require(walkLength >= 1, "walkLength must be at least 1")
    require(walksPerNode >= 1, "walksPerNode must be at least 1")
    // weighted: the per-step draw becomes Gumbel-max on ln(w) with the
    // hash-derived uniform (the weighted sampler's machinery, per-step) —
    // heavier edges are proportionally likelier, still bit-reproducible.
    // Parallel edges ACCUMULATE weight (a neighbor stored on many edges
    // is proportionally likelier); unweighted walks draw over the SET.
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .distinct()
      case Some(wc) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            when(col(wc).cast("double") > 0, col(wc).cast("double"))
              .otherwise(raise_error(lit(
                s"randomWalks: non-positive weight in '$wc' - drop " +
                  "non-edges upstream")).cast("double")).as("__w"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .groupBy("src", "dst").agg(sum("__w").as("__w"))
    }).repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-step walker frames are localCheckpoint'ed (r14): persist+count
    // kept the whole step chain's logical plan alive, so each step's
    // action re-analyzed a tree that grew with walkLength and the
    // returned corpus handed consumers (skip-gram self-joins!) a
    // multi-MB plan — guide §3.3: materialize to cut the plan
    var cur = e.select(col("src").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("walk"),
        col("start").as("cur"))
      .pinned()
    val steps = scala.collection.mutable.ListBuffer[(DataFrame, Int)](
      (cur, 0))
    (1 to walkLength).foreach { s =>
      // the step's selection struct: min(struct) picks the md5-smallest
      // neighbor (unweighted) or — via the negated key — the
      // Gumbel-max ln(w) − ln(−ln(u)) winner (weighted); ties by
      // neighbor id either way
      val hv =
        if (weightCol.isDefined) {
          val u = (conv(substring(md5(concat_ws("#",
            lit(samplingSeed.toString), col("cur").cast("string"),
            col("dst").cast("string"), col("walk").cast("string"),
            lit(s.toString))), 1, 8), 16, 10)
            .cast("long") + lit(1L)).cast("double") / lit(4294967297.0)
          struct((-(log(col("__w")) - log(-log(u)))).as("h"),
            col("dst").as("v"))
        } else
          struct(
            md5(concat_ws(":",
              col("cur").cast("string"), col("dst").cast("string"),
              lit(samplingSeed.toString), col("walk").cast("string"),
              lit(s.toString))).as("h"),
            col("dst").as("v"))
      val nxt = e.join(cur, e("src") === cur("cur"))
        .select(col("start"), col("walk"), hv.as("__hv"))
        .groupBy(col("start"), col("walk"))
        .agg(min(col("__hv")).as("__m"))
        .select(col("start"), col("walk"), col("__m.v").as("cur"))
        .pinned() // pin + truncate before the next join reads it
      steps += ((nxt, s))
      cur = nxt
    }
    val out = steps.map { case (df, s) =>
        df.select(col("start"), col("walk"), lit(s).as("step"),
          col("cur").as("node"))
      }.reduce(_.unionAll(_))
      .pinned() // the corpus consumers see a leaf, not the loop
    e.unpersist(blocking = false)
    out
  }

  /** node2vec-biased walk corpus (Grover & Leskovec 2016) —
    * [[randomWalks]]'s second-order sibling: the per-step draw is the
    * same seeded Gumbel-max weighted choice, but each candidate edge
    * weight is multiplied by the search-bias factor α(prev, v):
    * `1/p` when `v` IS the previous node (return), `1` when `v` is a
    * neighbor of the previous node (BFS-ish stay-local), `1/q`
    * otherwise (DFS-ish explore) — low `p` keeps walks local
    * (structural-equivalence embeddings), low `q` pushes them outward
    * (homophily embeddings), and `p = q = 1` degrades EXACTLY to the
    * weighted [[randomWalks]] draw (bit-identical corpus — α ≡ 1
    * leaves every Gumbel key unchanged; differential-pinned in
    * GraphSpec). Step 1 has no previous node and draws unbiased, the
    * standard first-step convention. Unweighted graphs walk with unit
    * edge weight (still the Gumbel draw, so the p/q factors compose);
    * sinks truncate as in [[randomWalks]]. Returns
    * `start | walk | step | node` (step 0 = the start node itself).
    *
    * Scale shape: [[randomWalks]]'s stationary src-partitioned
    * adjacency and walker-grain per-step exchange, plus ONE extra
    * equi-join per step — the candidate frame against the adjacency on
    * `(prev, dst)` to test prev-neighborhood — candidate-grain
    * (walkers × out-degree), never quadratic; the alternative
    * (per-node neighbor arrays) explodes on hub nodes, a join does
    * not. Driver sees one count per step (the lineage-depth pin);
    * nothing collects. */
  def node2vecWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walkLength: Int,
      walksPerNode: Int = 1,
      p: Double = 1.0,
      q: Double = 1.0,
      samplingSeed: Long = 42L,
      weightCol: Option[String] = None): DataFrame = {
    require(walkLength >= 1, "walkLength must be at least 1")
    require(walksPerNode >= 1, "walksPerNode must be at least 1")
    require(p > 0 && q > 0,
      s"node2vecWalks: return parameter p and in-out parameter q must " +
        s"be positive (got p=$p, q=$q)")
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .distinct().withColumn("__w", lit(1.0))
      case Some(wc) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            when(col(wc).cast("double") > 0, col(wc).cast("double"))
              .otherwise(raise_error(lit(
                s"node2vecWalks: non-positive weight in '$wc' - drop " +
                  "non-edges upstream")).cast("double")).as("__w"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .groupBy("src", "dst").agg(sum("__w").as("__w"))
    }).repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nbr = e.select(col("src").as("__ps"), col("dst").as("__pd"),
      lit(true).as("__isnbr"))
    val nodeType = e.schema("src").dataType
    var cur = e.select(col("src").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("walk"),
        lit(null).cast(nodeType).as("prev"),
        col("start").as("cur"))
      .pinned() // truncate per-step lineage (the randomWalks r14 note)
    val steps = scala.collection.mutable.ListBuffer[(DataFrame, Int)](
      (cur, 0))
    (1 to walkLength).foreach { s =>
      // identical uniform derivation to the weighted randomWalks draw —
      // the p = q = 1 bit-equality rides on this string byte-for-byte
      val u = (conv(substring(md5(concat_ws("#",
        lit(samplingSeed.toString), col("cur").cast("string"),
        col("dst").cast("string"), col("walk").cast("string"),
        lit(s.toString))), 1, 8), 16, 10)
        .cast("long") + lit(1L)).cast("double") / lit(4294967297.0)
      // α in ONE multiply inside the ln (not ln w + ln α) so the float
      // chain is replayable term-for-term by the DuckDB oracle
      val alpha =
        if (s == 1) lit(1.0)
        else when(col("dst") === col("prev"), lit(1.0 / p))
          .when(col("__isnbr").isNotNull, lit(1.0))
          .otherwise(lit(1.0 / q))
      val key = log(col("__w") * alpha) - log(-log(u))
      val cand0 = e.join(cur, e("src") === cur("cur"))
      val cand =
        if (s == 1) cand0.withColumn("__isnbr", lit(null).cast("boolean"))
        else cand0.join(nbr,
          cand0("prev") === nbr("__ps") && cand0("dst") === nbr("__pd"),
          "left")
      val nxt = cand
        .select(col("start"), col("walk"), col("cur").as("__c"),
          struct((-key).as("h"), col("dst").as("v")).as("__hv"))
        .groupBy(col("start"), col("walk"))
        // __c (the node being left) is constant within the group — max
        // is just a deterministic pick of that constant
        .agg(min(col("__hv")).as("__m"), max(col("__c")).as("prev"))
        .select(col("start"), col("walk"), col("prev"),
          col("__m.v").as("cur"))
        .pinned() // pin + truncate before the next join reads it
      steps += ((nxt, s))
      cur = nxt
    }
    val out = steps.map { case (df, s) =>
        df.select(col("start"), col("walk"), lit(s).as("step"),
          col("cur").as("node"))
      }.reduce(_.unionAll(_))
      .pinned() // the corpus consumers see a leaf, not the loop
    e.unpersist(blocking = false)
    out
  }

  /** metapath2vec walk corpus (Dong et al. 2017) — [[randomWalks]]
    * constrained to a heterogeneous METAPATH: step `s` draws only from
    * edges whose `typeCol` equals `path((s−1) mod path.length)`,
    * applied cyclically for `cycles` rounds (walk length =
    * `path.length × cycles`). On a typed graph an unconstrained walk
    * corpus is dominated by whichever relation has the highest degree;
    * the metapath (author–paper–author, customer–order–supplier) keeps
    * every walk semantically typed, which is what makes heterogeneous
    * skip-gram embeddings meaningful. Walks start at every distinct
    * source of a `path.head`-typed edge; the per-step draw is
    * [[randomWalks]]'s seeded md5 minimum (or, with `weightCol`, its
    * Gumbel-max weighted choice) — identical derivation strings, so on
    * a single-type graph with `path = Seq(t)` the corpus is
    * bit-identical to [[randomWalks]] over that typed slice
    * (differential-pinned). A node with no out-edge of the step's type
    * truncates the walk, the typed analogue of sink truncation.
    * Returns `start | walk | step | node` (step 0 = start). Related:
    * [[sampleMetapath]] serves bounded seed sets through an index;
    * this generates the corpus-scale walk frame.
    *
    * Scale shape: the typed adjacency persists ONCE partitioned by
    * `src`; each step filters it by type (partition-local, no
    * reshuffle) and reduces candidates with the same walker-grain
    * map-side-combined `min(struct)` as [[randomWalks]]. */
  def metapathWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      typeCol: String,
      path: Seq[String],
      cycles: Int = 1,
      walksPerNode: Int = 1,
      samplingSeed: Long = 42L,
      weightCol: Option[String] = None): DataFrame = {
    require(path.nonEmpty, "path must be non-empty (one edge type per step)")
    require(cycles >= 1, "cycles must be at least 1")
    require(walksPerNode >= 1, "walksPerNode must be at least 1")
    require(edges.columns.contains(typeCol),
      s"metapathWalks: '$typeCol' is not a column of the edge frame " +
        s"(${edges.columns.mkString(", ")})")
    require(edges.schema(typeCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"metapathWalks: '$typeCol' must be a string edge-type column")
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(typeCol).as("__t"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .distinct()
      case Some(wc) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(typeCol).as("__t"),
            when(col(wc).cast("double") > 0, col(wc).cast("double"))
              .otherwise(raise_error(lit(
                s"metapathWalks: non-positive weight in '$wc' - drop " +
                  "non-edges upstream")).cast("double")).as("__w"))
          .where(col("src").isNotNull && col("dst").isNotNull)
          .groupBy("src", "dst", "__t").agg(sum("__w").as("__w"))
    }).repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = e.where(col("__t") === lit(path.head))
      .select(col("src").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("walk"),
        col("start").as("cur"))
      .pinned() // truncate per-step lineage (the randomWalks r14 note)
    val steps = scala.collection.mutable.ListBuffer[(DataFrame, Int)](
      (cur, 0))
    (1 to path.length * cycles).foreach { s =>
      val stepType = path((s - 1) % path.length)
      val hv =
        if (weightCol.isDefined) {
          val u = (conv(substring(md5(concat_ws("#",
            lit(samplingSeed.toString), col("cur").cast("string"),
            col("dst").cast("string"), col("walk").cast("string"),
            lit(s.toString))), 1, 8), 16, 10)
            .cast("long") + lit(1L)).cast("double") / lit(4294967297.0)
          struct((-(log(col("__w")) - log(-log(u)))).as("h"),
            col("dst").as("v"))
        } else
          struct(
            md5(concat_ws(":",
              col("cur").cast("string"), col("dst").cast("string"),
              lit(samplingSeed.toString), col("walk").cast("string"),
              lit(s.toString))).as("h"),
            col("dst").as("v"))
      val et = e.where(col("__t") === lit(stepType))
      val nxt = et.join(cur, et("src") === cur("cur"))
        .select(col("start"), col("walk"), hv.as("__hv"))
        .groupBy(col("start"), col("walk"))
        .agg(min(col("__hv")).as("__m"))
        .select(col("start"), col("walk"), col("__m.v").as("cur"))
        .pinned() // pin + truncate before the next join reads it
      steps += ((nxt, s))
      cur = nxt
    }
    val out = steps.map { case (df, s) =>
        df.select(col("start"), col("walk"), lit(s).as("step"),
          col("cur").as("node"))
      }.reduce(_.unionAll(_))
      .pinned() // the corpus consumers see a leaf, not the loop
    e.unpersist(blocking = false)
    out
  }

  /** Induced-subgraph edge extraction over an INDEXED edge table — the
    * step after [[neighborhood]]/[[sampleNeighbors]] picks a node set:
    * fetch every stored edge BOTH of whose endpoints are in the set
    * (PyG's `subgraph()` shape — the adjacency a GNN minibatch or an
    * egonet visualization actually consumes). One index probe on the
    * src column locates candidate files (a qualifying edge's file must
    * hold one of the set's keys in src), then a row-level residual
    * keeps `src ∈ S AND dst ∈ S` — pruning is invisible, exactly the
    * `query()` contract. The set is bounded (`maxNodes`, fail-fast):
    * induced extraction over a corpus-sized set is a join, not a
    * serving call. Returns the stored-orientation `srcCol | dstCol`
    * pairs. */
  def induceEdges(
      index: graft.Index,
      srcCol: String,
      dstCol: String,
      nodes: Seq[Any],
      maxNodes: Int = 100000): DataFrame = {
    require(nodes.nonEmpty, "nodes must be non-empty")
    require(maxNodes > 0, "maxNodes must be positive")
    val set = nodes.distinct
    require(set.size <= maxNodes,
      s"induceEdges: ${set.size} nodes exceed maxNodes=$maxNodes - an " +
        "induced subgraph over a corpus-sized set is a semi-join " +
        "(index.join), not a serving call")
    val located = index.locateFiles(Map(srcCol -> set))
    probesTl.set(Seq((located.size, index.files.size)))
    val out = index.readFiles(located)
    // the maxNodes default (10^5) sits far past the isin comfort zone —
    // the residual rides the broadcast membership path, not a literal tree
    def sPred(c: String) = IndexProbe.memberFilter(index.spark,
      out.schema(c).dataType, set)(col(c))
    out.where(sPred(srcCol) && sPred(dstCol))
      .select(col(srcCol), col(dstCol))
  }

  /** Build (or incrementally extend) the SERVE-SHAPED index over an
    * edge lake — the index shape graph serving needs, promoted to API
    * from the ×300 crossover measurement (BENCH_SCALE
    * scale_r13_ego_serve_crossover): **range(srcCol) + bloom(dstCol)**,
    * O(files) index rows. A regular (distinct-key) dual index is the
    * WRONG serving shape at web scale: it stores every distinct
    * endpoint per file (~260M values at ×300 — index nearly as large as
    * the data), so each per-hop locate scans the lake again and the
    * indexed egonet LOSES to a full scan 10×. The serve shape stores
    * one `[min, max]` struct per file for `srcCol` (edge writers
    * cluster/sort by src, so ranges are tight) and one fixed-size bloom
    * per file for `dstCol` (scattered side — membership, not
    * enumeration); measured at ×300 (2.1 GB / 512 files): fan-out
    * sample 1.75 s, metapath 1.13 s, 2-hop egonet 2.00 s vs 2.96 s
    * full-scan BFS at 99.4 %+ bytes pruned, per-hop locate a 512-row
    * scan. Feeds [[neighborhood]] / [[sampleNeighbors]] /
    * [[sampleMetapath]] / [[induceEdges]] directly. Idempotent:
    * reconnects if `indexName` exists (the identical index defs are
    * no-ops; a conflicting shape on either column throws the
    * exclusivity rule), upserts the file registrations, and `update()`
    * indexes only the not-yet-indexed files — the incremental
    * edge-lake ingest path. Pair with [[graft.Index.warmProbeCache]]
    * (or `spark.graft.warmOnConnect`) in the serving process. */
  def buildServeIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexName: String,
      edgeFiles: Seq[String],
      srcCol: String,
      dstCol: String,
      format: String = "parquet",
      bloomFpr: Double = 0.01): graft.Index = {
    require(edgeFiles.nonEmpty, "buildServeIndex: edgeFiles is empty")
    // schema from one file (parquet/orc are self-describing; a csv/json
    // edge lake should go through Index() directly with a declared schema)
    val schema = spark.read.format(format)
      .option("inferSchema", "true").option("header", "true")
      .load(edgeFiles.head).schema
    require(schema.fieldNames.contains(srcCol) &&
      schema.fieldNames.contains(dstCol),
      s"buildServeIndex: edge files lack '$srcCol'/'$dstCol' " +
        s"(schema: ${schema.fieldNames.mkString(", ")})")
    val idx = graft.Index(spark, indexName, schema, format)
    idx.addRangeIndex(srcCol)
    idx.addBloomIndex(dstCol, fpr = bloomFpr)
    idx.addFile(edgeFiles: _*)
    idx.update()
    idx
  }

  /** Persist a centrality result (any `node | score…` frame: pageRank,
    * hits, degrees) as a crash-safe snapshot table under `dir` — the
    * train-once/serve-for-months shape the artifact store gives models,
    * applied to graph scores: centrality over a web-scale link graph is
    * hours of iteration, and every downstream consumer (SQL weighting,
    * sampling priors, join enrichment) reads the FROZEN result, not the
    * computation. Atomic snapshot-swap semantics (readers of the old
    * snapshot are unaffected mid-overwrite). */
  def persistScores(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      scores: DataFrame): Long =
    new graft.store.SnapshotTable(spark, dir).overwrite(scores)

  /** Persist centrality scores AS AN INDEXED LAKE ([[persistScores]]'s
    * serving-optimized sibling): the `node | score…` frame is split into
    * `nBuckets` score-QUANTILE-banded parquet files under `dir/data` and
    * a RANGE index over `scoreCol` is built (index store `indexName`),
    * so threshold serving — "nodes with pagerank ≥ τ", top-decile
    * extracts for sampling priors — locates only the band files whose
    * [min, max] overlaps the span instead of scanning the node universe.
    * Quantile banding keeps the bands balanced whatever the score
    * distribution (centrality is power-law — fixed-width bands would put
    * ~every node in band 0 and prune nothing on the head). Banding is
    * one bounded `percentile` aggregate + a literal CASE projection +
    * one band-grain shuffle; at web scale the scores frame is node-grain
    * (billions, not trillions) and this runs once per training of the
    * frozen artifact. `approx = true` swaps the exact `percentile`
    * multiset aggregate for a bounded-memory KLL sketch
    * ([[graft.functions.Kll.quantilesAgg]]) — at billions of nodes the
    * exact aggregate materializes the full score multiset on one
    * reducer, while the sketch is O(k) state with the same banding role
    * (band cuts only steer file placement; serving correctness rides
    * the range index's true per-file [min, max], so approximate cuts
    * never change results — only band balance, within sketch error).
    * Idempotent per `indexName` (re-persist replaces).
    * Serve with `index.queryRange(scoreCol, τ, hi)` — pruning evidence
    * rides `pruningMetrics` under `spark.graft.metricsEnabled`. */
  def persistScoresIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      scores: DataFrame,
      scoreCol: String,
      nBuckets: Int = 16,
      indexName: String = "graft_scores",
      approx: Boolean = false): graft.Index = {
    require(nBuckets >= 1 && nBuckets <= 10000,
      "nBuckets must be in [1, 10000]")
    require(scores.columns.contains(scoreCol),
      s"persistScoresIndexed: '$scoreCol' is not a column of the scores " +
        s"frame (${scores.columns.mkString(", ")})")
    require(!scores.columns.contains("__band"),
      "persistScoresIndexed: the scores frame may not carry a __band " +
        "column")
    val banded =
      if (nBuckets == 1) scores.withColumn("__band", lit(0))
      else {
        val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
        val ths: Seq[Double] = if (approx) {
          val row = scores.agg(graft.functions.Kll.quantilesAgg(
            col(scoreCol).cast("double"), 4096, probs).as("__q")).first()
          require(!row.isNullAt(0) && row.getSeq[Row](0).nonEmpty,
            s"persistScoresIndexed: no non-null values in '$scoreCol'")
          row.getSeq[Row](0).map(_.getDouble(1))
        } else {
          val row = scores.agg(call_function("percentile",
            col(scoreCol).cast("double"), lit(probs.toArray)).as("__q"))
            .first()
          require(!row.isNullAt(0),
            s"persistScoresIndexed: no non-null values in '$scoreCol'")
          row.getSeq[Double](0)
        }
        val band = ths.zipWithIndex.reverse.foldLeft(lit(nBuckets - 1)) {
          case (acc, (t, i)) =>
            when(col(scoreCol).cast("double") <= lit(t), lit(i))
              .otherwise(acc)
        }
        // null scores land in band 0 (the CASE's first arm is false for
        // null → otherwise chain ends at band nBuckets-1; pin them low
        // explicitly so the top band stays pure)
        scores.withColumn("__band",
          when(col(scoreCol).isNull, lit(0)).otherwise(band))
      }
    banded.repartition(nBuckets, col("__band"))
      .write.partitionBy("__band").mode("overwrite").parquet(s"$dir/data")
    // Hadoop-FS enumeration (not java.io.File): `dir` may be a file://
    // URI or a non-local path (hdfs/s3) — the production serving shape
    // this method exists for. Fully-qualified paths from listStatus keep
    // the index's file ledger scheme-correct on any filesystem.
    val files = {
      val dataPath = new org.apache.hadoop.fs.Path(s"$dir/data")
      val f = graft.store.Fs.fs(spark, s"$dir/data")
      if (!f.exists(dataPath)) Seq.empty[String]
      else f.listStatus(dataPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__band="))
        .flatMap(d => f.listStatus(d.getPath).toSeq)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
          s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).sorted
    }
    require(files.nonEmpty,
      s"persistScoresIndexed: no data files written under $dir/data")
    // schema from a written file (single-file read — the __band dir key
    // never enters the stored schema), train-once/replace semantics
    if (graft.Index.exists(spark, indexName))
      graft.Index.remove(spark, indexName)
    val idx = graft.Index(spark, indexName,
      spark.read.parquet(files.head).schema, "parquet")
    idx.addRangeIndex(scoreCol)
    idx.addFile(files: _*)
    idx.update()
    idx
  }

  /** Read persisted centrality scores back ([[persistScores]]'s dual) —
    * register the result as a temp view and the scores are one
    * `JOIN graft_scores USING (node)` away from any SQL pipeline
    * (q_sql_graph's pattern). Throws if nothing was persisted. */
  def scoresView(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    new graft.store.SnapshotTable(spark, dir).read().getOrElse(
      throw new IllegalStateException(
        s"no persisted graph scores under $dir - run persistScores first"))
}
