package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph centrality: hand-computed PageRank fixtures, a driver replay of
  * the power iteration (dangling mass included), probability-mass
  * conservation, partitioning invariance, and degree accounting. */
class GraphSpec extends GraftSuite {
  import spark.implicits._

  private def r(x: Double, s: Int = 12): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver replay of the exact iteration the operator documents,
    * including the per-iteration rounding. */
  private def replay(
      edges: Seq[(Long, Long)],
      iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var pr = nodes.map(_ -> r(1.0 / n)).toMap
    (1 to iters).foreach { _ =>
      val dangling = nodes.filterNot(outdeg.contains).map(pr).sum
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / outdeg(s) }.sum).toMap
      pr = nodes.map(v => v -> r((1 - d) / n +
        d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    pr
  }

  test("pageRank: hand-computed 2-node dangling graph, first iteration") {
    val got = Graph.pageRank(Seq((1L, 2L)).toDF("s", "t"), "s", "t",
        iters = 1)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    // N=2, pr0 = .5 each; node 2 is dangling with mass .5
    // pr1(1) = .075 + .85*(0 + .25)   = .2875
    // pr1(2) = .075 + .85*(.5 + .25)  = .7125
    assert(got == Map(1L -> 0.2875, 2L -> 0.7125))
  }

  test("pageRank: driver replay on a cyclic multigraph; mass conserved; " +
      "repartition-invariant; more in-links means more rank") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L),
      (2L, 3L)) // multi-edge 2->3 counts twice
    val df = edges.toDF("s", "t")
    val got = Graph.pageRank(df, "s", "t", iters = 7)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val want = replay(edges, iters = 7)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"node $k: $v vs ${want(k)}")
    }
    // a probability distribution (rounding leaves ~1e-11 slack)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // node 3 collects the most in-link mass
    assert(got(3L) == got.values.max)
    // partitioning must not change a single value
    val re = Graph.pageRank(df.repartition(7), "s", "t", iters = 7)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    assert(re == got)
  }

  test("pageRank: uniform cycle stays uniform; guards") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val got = Graph.pageRank(cyc, "s", "t", iters = 5)
      .collect().map(r0 => r0.getDouble(1))
    got.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
    intercept[IllegalArgumentException] {
      Graph.pageRank(cyc, "s", "t", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(cyc, "s", "t", damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(spark.emptyDataFrame
        .select(lit(1L).as("s"), lit(2L).as("t")), "s", "t")
    }
  }

  test("personalizedPageRank: R = all nodes equals uniform pageRank; " +
      "driver replay of the reset-weighted recurrence; mass conserved; " +
      "off-graph seeds ignored; empty intersection raises") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val df = edges.toDF("s", "t")
    val allNodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // R = everything == uniform PageRank, value for value
    val uni = Graph.pageRank(df, "s", "t", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val rAll = Graph.personalizedPageRank(df, "s", "t",
        allNodes.toDF("node"), "node", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    assert(rAll == uni)

    // R = {1}, with an off-graph seed 99 that must be ignored
    val got = Graph.personalizedPageRank(df, "s", "t",
        Seq(1L, 99L).toDF("node"), "node", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    // driver replay with reset weights w(1)=1, else 0
    val nodes = allNodes.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    def w(v: Long) = if (v == 1L) 1.0 else 0.0
    var pr = nodes.map(v => v -> r(w(v))).toMap
    (1 to 6).foreach { _ =>
      val dm = nodes.filterNot(outdeg.contains).map(pr).sum
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s0, _) =>
        pr(s0) / outdeg(s0) }.sum).toMap
      pr = nodes.map(v => v -> r(0.15 * w(v) +
        0.85 * (contrib.getOrElse(v, 0.0) + dm * w(v)))).toMap
    }
    got.foreach { case (k, v) =>
      assert(math.abs(v - pr(k)) < 1e-9, s"node $k: $v vs ${pr(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the seed holds more rank than under the uniform teleport
    assert(got(1L) > uni(1L))

    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(df, "s", "t",
        Seq(99L).toDF("node"), "node")
    }
  }

  test("weightedPageRank: driver replay with proportional flow; " +
      "unit weights track the uniform ranks; non-positive weight raises") {
    // node 1 splits 80/20 between 2 and 3; 2 and 3 return all to 1
    val edges = Seq((1L, 2L, 4.0), (1L, 3L, 1.0), (2L, 1L, 1.0),
      (3L, 1L, 2.0))
    val df = edges.toDF("s", "t", "w")
    val got = Graph.weightedPageRank(df, "s", "t", "w", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    // driver replay of the weighted recurrence with the same rounding
    val nodes = Seq(1L, 2L, 3L)
    val outW = edges.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> r(1.0 / 3)).toMap
    (1 to 6).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(_.map {
        case (s0, _, w) => pr(s0) * (w / outW(s0)) }.sum).toMap
      pr = nodes.map(v => v -> r(0.15 / 3 +
        0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    got.foreach { case (k, v) =>
      assert(math.abs(v - pr(k)) < 1e-9, s"node $k: $v vs ${pr(k)}")
    }
    // the heavier edge pulls more rank to 2 than to 3
    assert(got(2L) > got(3L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)

    // unit weights reproduce the uniform ranks (to float slack: the
    // weighted path multiplies by a precomputed 1/outdeg)
    val unit = Graph.weightedPageRank(
        df.withColumn("w", lit(1.0)), "s", "t", "w", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val uni = Graph.pageRank(df, "s", "t", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    unit.foreach { case (k, v) => assert(math.abs(v - uni(k)) < 1e-9) }

    // a zero weight is refused in-plan
    intercept[Exception] {
      Graph.weightedPageRank(
        Seq((1L, 2L, 0.0)).toDF("s", "t", "w"), "s", "t", "w").collect()
    }
  }

  test("connectedComponents: undirected transitive closure, min labels, " +
      "direction-invariant") {
    // two components: {1,2,3,7} via chain, {10,11} isolated pair
    val edges = Seq((2L, 1L), (2L, 3L), (7L, 3L), (10L, 11L))
    val got = Graph.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))
    // undirected: flipping every edge changes nothing
    val flipped = Graph.connectedComponents(
        edges.map(_.swap).toDF("s", "t"), "s", "t")
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(flipped == got)
  }

  test("hits: driver replay of the normalized half-steps on a bipartite " +
      "graph; sides sum to 1; the better-connected supplier out-hubs") {
    // suppliers 1,2 -> customers 10,11,12; supplier 1 serves all three,
    // supplier 2 only customer 12
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L))
    val got = Graph.hits(edges.toDF("s", "t"), "s", "t", iters = 4)
      .collect().map(r0 => (r0.getLong(0),
        (r0.getDouble(1), r0.getDouble(2)))).toMap
    // driver replay with the same rounding discipline
    val nodes = Seq(1L, 2L, 10L, 11L, 12L)
    var h = nodes.map(_ -> r(1.0 / 5)).toMap
    var a = Map.empty[Long, Double]
    (1 to 4).foreach { _ =>
      val aRaw = edges.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum)
      val at = aRaw.values.sum
      a = nodes.map(v => v -> r(aRaw.getOrElse(v, 0.0) / at)).toMap
      val hRaw = edges.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum)
      val ht = hRaw.values.sum
      h = nodes.map(v => v -> r(hRaw.getOrElse(v, 0.0) / ht)).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - h(v)) < 1e-9, s"hub $v")
      assert(math.abs(got(v)._2 - a(v)) < 1e-9, s"auth $v")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
    // supplier 1 out-hubs supplier 2; customers have zero hub score
    assert(got(1L)._1 > got(2L)._1)
    assert(got(10L)._1 == 0.0 && got(11L)._1 == 0.0)
    // the shared customer 12 is the top authority
    assert(got(12L)._2 == Seq(10L, 11L, 12L).map(got(_)._2).max)
    intercept[IllegalArgumentException] {
      Graph.hits(edges.toDF("s", "t"), "s", "t", iters = 0)
    }
  }

  test("triangleCount: K4 has 4, multi-edges/self-loops/direction " +
      "collapse, hub star has none") {
    // K4 on {1,2,3,4} = 4 triangles; plus noise: duplicate edge,
    // reversed duplicate, self-loop, and a pendant node
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val noisy = k4 ++ Seq((2L, 1L), (1L, 2L), (3L, 3L), (4L, 9L))
    val got = Graph.triangleCount(noisy.toDF("s", "t"), "s", "t").head()
    assert(got.getLong(0) == 5L, "nodes") // {1,2,3,4,9}
    assert(got.getLong(1) == 7L, "edges") // 6 K4 edges + (4,9)
    assert(got.getLong(2) == 4L, "triangles")
    // a star (one hub, no closures) has zero triangles — the shape the
    // degree orientation exists to keep cheap
    val star = (2L to 30L).map(i => (1L, i))
    val s = Graph.triangleCount(star.toDF("s", "t"), "s", "t").head()
    assert(s.getLong(2) == 0L)
    // triangle sharing a hub: star + one rim edge closes exactly one
    val rim = star ++ Seq((7L, 8L))
    val r1 = Graph.triangleCount(rim.toDF("s", "t"), "s", "t").head()
    assert(r1.getLong(2) == 1L)
  }

  test("degrees: out/in accounting, one-sided nodes report zero") {
    val df = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 2L)).toDF("s", "t")
    val got = Graph.degrees(df, "s", "t")
      .collect().map(r0 => r0.getLong(0) -> ((r0.getLong(1), r0.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 0L)), // multi-edge counts per edge
      2L -> ((1L, 2L)),
      3L -> ((0L, 2L))))
  }

  test("localClustering: hand-computed K4 + pendant; credits sum to 3x " +
      "the census; assortativity replays the Pearson formula") {
    // K4 on {1,2,3,4} plus pendant 5-1: node 1 sits in 3 of the 4
    // triangles at degree 4 (lcc 0.5), nodes 2-4 close every wedge
    // (lcc 1.0), the pendant has no wedge (lcc null)
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("s", "t")
    val got = Graph.localClustering(k4p, "s", "t")
      .collect().map(r0 => r0.getLong(0) ->
        ((r0.getLong(1), r0.getLong(2),
          if (r0.isNullAt(3)) None else Some(r0.getDouble(3))))).toMap
    assert(got(1L) == ((4L, 3L, Some(0.5))))
    Seq(2L, 3L, 4L).foreach(n => assert(got(n) == ((3L, 3L, Some(1.0)))))
    assert(got(5L) == ((1L, 0L, None)))
    // triple-credit identity vs the global census
    val census = Graph.triangleCount(k4p, "s", "t").head()
    assert(got.values.map(_._2).sum == 3L * census.getLong(2))
    // assortativity: replay the five-sum Pearson over symmetrized
    // endpoint degrees in the driver
    val r0 = Graph.assortativity(k4p, "s", "t").head()
    assert(r0.getLong(0) == 5L && r0.getLong(1) == 7L)
    val deg = Map(1L -> 4.0, 2L -> 3.0, 3L -> 3.0, 4L -> 3.0, 5L -> 1.0)
    val canon = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val xy = canon.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = xy.size.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, syy) = (xy.map(p => p._1 * p._1).sum,
      xy.map(p => p._2 * p._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val want = BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(2) == want)
    // degree-regular graph (a 4-cycle): zero variance -> null
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    assert(Graph.assortativity(cyc, "s", "t").head().isNullAt(2))
  }

  test("neighborhood: index-pruned BFS matches a full-scan driver BFS; " +
      "key-local hops locate fewer files than the lake holds") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val got = Graph.neighborhood(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), hops = 2, direction = "both")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    // pruning evidence: the hop-1 probe (two customer keys against the
    // src-banded lake) must NOT read every file — this is the point of
    // composing BFS with the index layer
    val probes = Graph.lastNeighborhoodProbes
    assert(probes.nonEmpty)
    assert(probes.head._1 < probes.head._2,
      s"hop-1 must prune: located=${probes.head._1} of ${probes.head._2}")
    assert(probes.forall { case (l, t) => l <= t })
    // full-scan oracle: driver BFS over the same symmetrized edge set
    val edges = spark.read.parquet(lk.edgesFiles: _*)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val want = scala.collection.mutable.Map[Long, Int](3L -> 0, 7L -> 0)
    var frontier = Set(3L, 7L)
    (1 to 2).foreach { h =>
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(want.contains)
      next.foreach(n => want(n) = h)
      frontier = next
    }
    assert(got == want.toMap,
      s"egonet mismatch: ${got.size} got vs ${want.size} want")
    // hop-0-only degenerate + direction variants stay consistent
    val zero = Graph.neighborhood(lk.edgesIdx, "src", "dst",
      Seq(3L, 7L), hops = 0).collect()
    assert(zero.map(_.getLong(0)).toSet == Set(3L, 7L) &&
      zero.forall(_.getInt(1) == 0))
    val out1 = Graph.neighborhood(lk.edgesIdx, "src", "dst",
        Seq(3L), hops = 1, direction = "out")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    val wantOut = edges.filter(_._1 == 3L).map(_._2).toSet
    assert(out1.filter(_._2 == 1).keySet == wantOut)
    // a frontier that can't stay local fails fast naming the alternative
    val e = intercept[IllegalArgumentException] {
      Graph.neighborhood(lk.edgesIdx, "src", "dst", Seq(3L, 7L),
        hops = 2, direction = "both", maxFrontier = 5)
    }
    assert(e.getMessage.contains("maxFrontier"))
  }

  test("sampleNeighbors: seeded fan-out sample matches a driver replay " +
      "of the md5 rank; fanouts bound every hop; seed changes the " +
      "sample; probes prune") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val got = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), fanouts = Seq(5, 3), samplingSeed = 42L)
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
    assert(Graph.lastNeighborhoodProbes.head._1 <
      Graph.lastNeighborhoodProbes.head._2, "hop-1 must prune")
    // driver replay: distinct adjacency, md5(u:v:seed) ascending, take f
    val edges = spark.read.parquet(lk.edgesFiles: _*)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).distinct
    val adj: Map[Long, Seq[Long]] =
      edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def take(f: Set[Long], n: Int): Seq[(Long, Long)] =
      f.toSeq.flatMap { u =>
        adj.getOrElse(u, Seq.empty)
          .sortBy(v => md5hex(s"$u:$v:42")).take(n).map(u -> _)
      }
    val s1 = take(Set(3L, 7L), 5)
    val f1 = s1.map(_._2).distinct.filterNot(Set(3L, 7L)).toSet
    val s2 = take(f1, 3)
    val want = s1.map(p => (1, p._1, p._2)) ++ s2.map(p => (2, p._1, p._2))
    assert(got.toSet == want.toSet,
      s"sample mismatch: ${got.length} got vs ${want.length} want")
    // every (hop, node) group is within its fanout
    val byHopNode = got.groupBy(t => (t._1, t._2)).view.mapValues(_.length)
    assert(byHopNode.forall { case ((h, _), n) =>
      n <= (if (h == 1) 5 else 3) })
    // a different seed draws a different sample (same sizes)
    val other = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), fanouts = Seq(5, 3), samplingSeed = 7L)
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
    assert(other.toSet != got.toSet, "seed must steer the sample")
    // replay stability: identical call, identical rows
    val again = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), fanouts = Seq(5, 3), samplingSeed = 42L)
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("sampleNeighbors weighted: Gumbel-top-f replay matches; heavier " +
      "edges are kept more often than the unweighted draw; non-positive " +
      "weight raises") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val got = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), fanouts = Seq(5, 2), samplingSeed = 42L,
        weightCol = Some("w"))
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
    // driver replay of the exact Gumbel key: ln w - ln(-ln u), u from
    // the first 8 md5 hex digits of "seed#u#v"
    val edges = spark.read.parquet(lk.edgesFiles: _*)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def gk(u: Long, v: Long, w: Double): Double = {
      val uu = (java.lang.Long.parseLong(
        md5hex(s"42#$u#$v").take(8), 16) + 1L).toDouble / 4294967297.0
      math.log(w) - math.log(-math.log(uu))
    }
    val adj: Map[Long, Seq[(Long, Double)]] = edges.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(t => (t._2, t._3)).toSeq }
    def take(f: Set[Long], n: Int): Seq[(Long, Long)] =
      f.toSeq.flatMap { u =>
        adj.getOrElse(u, Seq.empty)
          .sortBy { case (v, w) => (-gk(u, v, w), v) }.take(n)
          .map(p => u -> p._1)
      }
    val s1 = take(Set(3L, 7L), 5)
    val f1 = s1.map(_._2).distinct.filterNot(Set(3L, 7L)).toSet
    val s2 = take(f1, 2)
    val want = s1.map(p => (1, p._1, p._2)) ++ s2.map(p => (2, p._1, p._2))
    assert(got.toSet == want.toSet,
      s"weighted sample mismatch: ${got.length} got vs ${want.length} want")
    // weight steering: the weighted hop-2 draw must differ from the
    // unweighted one on the same frontier (weights are non-uniform)
    val unw = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), fanouts = Seq(5, 2), samplingSeed = 42L)
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
      .toSet
    assert(unw != got.toSet, "weights must steer the draw")
    // non-positive weight raises in-plan
    import spark.implicits._
    val badDir = tmpDir("graft_badw_")
    Seq((1L, 2L, 0.0)).toDF("src", "dst", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$badDir/t")
    val badFiles = new java.io.File(s"$badDir/t").listFiles()
      .filter(f0 => f0.getName.startsWith("part-") &&
        f0.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
    val bad = graft.Index(spark, "badw_idx",
      spark.read.parquet(s"$badDir/t").schema, "parquet")
    bad.addIndex("src")
    bad.addFile(badFiles: _*)
    bad.update()
    val e = intercept[Exception] {
      Graph.sampleNeighbors(bad, "src", "dst", Seq(1L), Seq(2),
        weightCol = Some("w"))
    }
    assert(e.getMessage != null)
  }

  test("induceEdges: exactly the stored edges with both endpoints in " +
      "the set; prunes; refuses corpus-sized sets") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val nodes = Graph.neighborhood(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L), hops = 2, direction = "both")
      .select("node").collect().map(_.getLong(0)).toSeq
    val got = Graph.induceEdges(lk.edgesIdx, "src", "dst", nodes)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(Graph.lastNeighborhoodProbes.head._1 <
      Graph.lastNeighborhoodProbes.head._2, "the src probe must prune")
    val ns = nodes.toSet
    val want = spark.read.parquet(lk.edgesFiles: _*)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
      .filter(p => ns(p._1) && ns(p._2)).toSet
    assert(got == want, s"${got.size} got vs ${want.size} want")
    assert(got.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Graph.induceEdges(lk.edgesIdx, "src", "dst", nodes, maxNodes = 3)
    }
    assert(e.getMessage.contains("maxNodes"))
  }

  test("q_sql_bfs: the pure-SQL recursive-CTE walk == the index-driven " +
      "neighborhood('in') on the same seeds") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val viaSql = graft.SparkEntry.queries("q_sql_bfs")(spark, sf)
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    val viaIdx = Graph.neighborhood(lk.edgesIdx, "src", "dst",
        Seq(20000005L, 20000009L), hops = 2, direction = "in")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    assert(viaSql == viaIdx,
      s"BFS mismatch: sql=${viaSql.size} idx=${viaIdx.size}")
    assert(viaSql.nonEmpty && viaSql.values.exists(_ == 2),
      "the walk must actually reach hop 2")
  }

  test("sampleMetapath: per-type driver replay of the md5 rank; hop " +
      "namespaces respected; probes prune; guards") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val got = Graph.sampleMetapath(lk.edgesIdx, "src", "dst", "etype",
        Seq(3L, 7L), path = Seq(("c2o", 5), ("o2s", 3)),
        samplingSeed = 42L)
      .collect().map(r0 =>
        (r0.getInt(0), r0.getString(1), r0.getLong(2), r0.getLong(3)))
    assert(Graph.lastNeighborhoodProbes.nonEmpty &&
      Graph.lastNeighborhoodProbes.forall { case (l, t) => l < t },
      s"per-type probes must prune: ${Graph.lastNeighborhoodProbes}")
    // driver replay: per-hop type filter, distinct adjacency,
    // md5(u:v:seed) ascending, take f
    val rows = spark.read.parquet(lk.edgesFiles: _*)
      .select("src", "dst", "etype").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getString(2))).distinct
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hop(frontier: Seq[Long], etype: String, f: Int): Seq[(Long, Long)] =
      rows.filter(e => e._3 == etype && frontier.contains(e._1))
        .map(e => (e._1, e._2)).distinct
        .groupBy(_._1).toSeq.flatMap { case (u, vs) =>
          vs.sortBy(p => (md5hex(s"$u:${p._2}:42"), p._2)).take(f) }
    val s1 = hop(Seq(3L, 7L), "c2o", 5)
    val f1 = s1.map(_._2).distinct.filterNot(Set(3L, 7L).contains)
    val s2 = hop(f1, "o2s", 3)
    val want = s1.map(p => (1, "c2o", p._1, p._2)).toSet ++
      s2.map(p => (2, "o2s", p._1, p._2)).toSet
    assert(got.toSet == want,
      s"metapath mismatch: got ${got.length} want ${want.size}")
    // type discipline: hop-1 neighbors live in the order namespace,
    // hop-2 in the supplier namespace
    assert(got.filter(_._1 == 1).forall(r0 =>
      r0._4 >= 10000000L && r0._4 < 20000000L))
    assert(got.filter(_._1 == 2).forall(_._4 >= 20000000L))
    assert(got.exists(_._1 == 2), "the metapath must reach hop 2")
    // a type with no edges at that hop produces an empty tail, not a crash
    val none = Graph.sampleMetapath(lk.edgesIdx, "src", "dst", "etype",
      Seq(3L), path = Seq(("o2s", 5), ("c2o", 3)))
    assert(none.count() == 0,
      "seeds in the customer namespace have no o2s out-edges")
    // guards
    val e1 = intercept[IllegalArgumentException] {
      Graph.sampleMetapath(lk.edgesIdx, "src", "dst", "etype",
        Seq(3L), path = Seq(("c2o", 0)))
    }
    assert(e1.getMessage.contains("fanout"))
    val e2 = intercept[IllegalArgumentException] {
      Graph.sampleMetapath(lk.edgesIdx, "src", "dst", "w",
        Seq(3L), path = Seq(("c2o", 2)))
    }
    assert(e2.getMessage.contains("string edge-type column"))
  }

  test("frontier probe shapes agree: forcing the broadcast membership " +
      "path (tiny probeValueLimit) returns the identical egonet, " +
      "sample, and induced subgraph as the literal isin path") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    def runAll(): (Set[(Long, Int)], Seq[(Int, Long, Long)],
        Set[(Long, Long)]) = {
      val ego = Graph.neighborhood(lk.edgesIdx, "src", "dst",
          Seq(3L, 7L), hops = 2, direction = "both")
        .collect().map(r0 => (r0.getLong(0), r0.getInt(1))).toSet
      val samp = Graph.sampleNeighbors(lk.edgesIdx, "src", "dst",
          Seq(3L, 7L), fanouts = Seq(5, 3), samplingSeed = 42L)
        .orderBy("hop", "node", "neighbor")
        .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getLong(2)))
        .toSeq
      val ind = Graph.induceEdges(lk.edgesIdx, "src", "dst",
          ego.map(_._1).toSeq)
        .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
      (ego, samp, ind)
    }
    val literal = runAll()
    // a 2-value cap pushes EVERY frontier past the literal path: the
    // index locate AND the row-level residual must ride the broadcast
    // membership expressions and return bit-identical results
    spark.conf.set("spark.graft.probeValueLimit", "2")
    try {
      val broadcastPath = runAll()
      assert(broadcastPath == literal,
        "broadcast membership path must equal the literal isin path")
    } finally spark.conf.unset("spark.graft.probeValueLimit")
  }

  test("randomWalks: driver replay of every seeded hash draw; sinks " +
      "truncate walks; every distinct src starts walksPerNode walks; " +
      "guards") {
    // node 4 is a sink (never a src): walks reaching it end early
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("s", "t")
    val got = Graph.randomWalks(edges, "s", "t", walkLength = 5,
        walksPerNode = 2, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L, 4L))
    val want = scala.collection.mutable.Map[(Long, Int, Int), Long]()
    for (start <- Seq(1L, 2L, 3L); walk <- 1 to 2) {
      var cur = start
      want((start, walk, 0)) = start
      var st = 1
      var alive = true
      while (st <= 5 && alive) {
        adj.get(cur) match {
          case Some(ns) =>
            val v = ns.minBy(n => (md5hex(s"$cur:$n:7:$walk:$st"), n))
            want((start, walk, st)) = v
            cur = v
          case None => alive = false
        }
        st += 1
      }
    }
    assert(got == want.toMap,
      s"walk corpus mismatch: got ${got.size} rows want ${want.size}")
    // the sink (node 4, never a src) starts no walk
    assert(!got.keys.exists(_._1 == 4L))
    // at least one walk actually hit the sink and truncated (else the
    // fixture tests nothing)
    assert(want.size < 3 * 2 * 6,
      "expected at least one truncated walk in the fixture")
    intercept[IllegalArgumentException] {
      Graph.randomWalks(edges, "s", "t", walkLength = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.randomWalks(edges, "s", "t", walkLength = 2, walksPerNode = 0)
    }
    // weighted: Gumbel-max replay, parallel edges accumulate weight
    val wEdges = Seq((1L, 2L, 1.0), (1L, 3L, 5.0), (1L, 3L, 2.0),
      (3L, 1L, 1.0), (3L, 4L, 2.0)).toDF("s", "t", "w")
    val wGot = Graph.randomWalks(wEdges, "s", "t", walkLength = 3,
        walksPerNode = 1, samplingSeed = 7L, weightCol = Some("w"))
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    val adjW = Map(1L -> Map(2L -> 1.0, 3L -> 7.0),
      3L -> Map(1L -> 1.0, 4L -> 2.0))
    def gumbelKey(cur: Long, v: Long, w: Double, st: Int): Double = {
      val u = (java.lang.Long.parseLong(
        md5hex(s"7#$cur#$v#1#$st").take(8), 16) + 1L).toDouble /
        4294967297.0
      math.log(w) - math.log(-math.log(u))
    }
    val wWant = scala.collection.mutable.Map[(Long, Int, Int), Long]()
    for (start <- Seq(1L, 3L)) {
      var cur = start
      wWant((start, 1, 0)) = start
      var st = 1
      var alive = true
      while (st <= 3 && alive) {
        adjW.get(cur) match {
          case Some(ns) =>
            val v = ns.toSeq
              .minBy { case (n, w) => (-gumbelKey(cur, n, w, st), n) }._1
            wWant((start, 1, st)) = v
            cur = v
          case None => alive = false
        }
        st += 1
      }
    }
    assert(wGot == wWant.toMap, "weighted walk replay mismatch")
    val eNeg = intercept[Exception] {
      Graph.randomWalks(
        Seq((1L, 2L, 0.0)).toDF("s", "t", "w"), "s", "t", 1,
        weightCol = Some("w")).collect()
    }
    assert(eNeg.getMessage.contains("non-positive weight") ||
      eNeg.getCause != null &&
        eNeg.getCause.getMessage.contains("non-positive weight"))
  }

  test("labelPropagation: driver replay of every sweep on two bridged " +
      "triangles; the 2-node oscillator freezes deterministically; " +
      "direction/multi-edge/self-loop invariance; guards") {
    def replay(
        canon: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      var labels = adj.keySet.map(n => n -> n).toMap
      (1 to iters).foreach { _ =>
        labels = adj.map { case (v, ns) =>
          val votes = ns.groupBy(labels).view.mapValues(_.size).toSeq
          v -> votes.minBy { case (l, c) => (-c, l) }._1
        }
      }
      labels
    }
    // two triangles bridged by one edge
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    (1 to 5).foreach { k =>
      val got = Graph.labelPropagation(tri.toDF("s", "t"), "s", "t",
          iters = k)
        .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
      assert(got == replay(tri, k), s"sweep-$k mismatch")
    }
    // communities stabilize: the two triangle cores share a label each
    val stable = Graph.labelPropagation(tri.toDF("s", "t"), "s", "t",
        iters = 5)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(stable(1L) == stable(2L), "triangle {1,2,3} must cohere")
    assert(stable(5L) == stable(6L), "triangle {4,5,6} must cohere")
    // sync-LPA oscillator: a single edge swaps labels every sweep —
    // the fixed iteration count freezes it deterministically
    val pair = Seq((1L, 2L))
    assert(Graph.labelPropagation(pair.toDF("s", "t"), "s", "t", 1)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap ==
      Map(1L -> 2L, 2L -> 1L))
    assert(Graph.labelPropagation(pair.toDF("s", "t"), "s", "t", 2)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L))
    // multi-edges, self-loops, and orientation collapse before voting
    val messy = Seq((2L, 1L), (1L, 2L), (1L, 1L), (3L, 1L), (2L, 3L),
      (3L, 2L))
    assert(Graph.labelPropagation(messy.toDF("s", "t"), "s", "t", 3)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap ==
      replay(Seq((1L, 2L), (1L, 3L), (2L, 3L)), 3))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(pair.toDF("s", "t"), "s", "t", 0)
    }
  }

  test("modularity: hand-computed on the bridged triangles; one-blob " +
      "labeling reads 0; unlabeled endpoint raises in-plan") {
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("s", "t") // m=7, bridge (3,4)
    // perfect split: e_c=3 each, d_c=7 each →
    // Q = 2·(3/7 − (7/14)²) = 6/7 − 1/2 = 0.357143 (round 6)
    val split = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L)).toDF("node", "label")
    val r0 = Graph.modularity(tri, "s", "t", split).head()
    assert(r0.getLong(0) == 2L && r0.getDouble(1) == 0.357143)
    // one blob: Q = m/m − (2m/2m)² = 0
    val blob = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(_ -> 1L)
      .toDF("node", "label")
    val r1 = Graph.modularity(tri, "s", "t", blob).head()
    assert(r1.getLong(0) == 1L && r1.getDouble(1) == 0.0)
    // the LPA composition grades its own communities above the blob
    val lpa = Graph.labelPropagation(tri, "s", "t", iters = 5)
    val r2 = Graph.modularity(tri, "s", "t", lpa).head()
    assert(r2.getDouble(1) > 0.0,
      "LPA communities on bridged triangles must beat the null model")
    // an unlabeled endpoint raises in-plan, naming the precondition
    val e = intercept[Exception] {
      Graph.modularity(tri, "s", "t",
        split.where(col("node") =!= 6L)).collect()
    }
    assert(e.getMessage.contains("no label") ||
      e.getCause != null && e.getCause.getMessage.contains("no label"))
  }

  test("hopDistances: the distributed BFS equals the index-driven " +
      "neighborhood on the same seeds; off-graph seeds are hop-0 " +
      "islands; guards") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val edges = spark.read.parquet(lk.edgesFiles: _*)
    val viaOp = Graph.hopDistances(edges, "src", "dst",
        Seq(20000005L, 20000009L).toDF("n"), "n", maxHops = 2,
        direction = "in")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    val viaIdx = Graph.neighborhood(lk.edgesIdx, "src", "dst",
        Seq(20000005L, 20000009L), hops = 2, direction = "in")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    assert(viaOp == viaIdx,
      s"BFS mismatch: op=${viaOp.size} idx=${viaIdx.size}")
    assert(viaOp.values.exists(_ == 2), "the walk must reach hop 2")
    // 'both' parity on a customer seed
    val bOp = Graph.hopDistances(edges, "src", "dst",
        Seq(3L).toDF("n"), "n", maxHops = 2, direction = "both")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    val bIdx = Graph.neighborhood(lk.edgesIdx, "src", "dst", Seq(3L),
        hops = 2, direction = "both")
      .collect().map(r0 => r0.getLong(0) -> r0.getInt(1)).toMap
    assert(bOp == bIdx)
    // an off-graph seed is its own hop-0 island
    val island = Graph.hopDistances(edges, "src", "dst",
      Seq(-5L).toDF("n"), "n", maxHops = 2).collect()
    assert(island.length == 1 && island.head.getLong(0) == -5L &&
      island.head.getInt(1) == 0)
    intercept[IllegalArgumentException] {
      Graph.hopDistances(edges, "src", "dst", Seq(3L).toDF("n"), "n",
        maxHops = -1)
    }
  }

  test("walkSkipGrams: hand-computed window pairs on a two-walk frame; " +
      "cross-walk pairs never appear; guards") {
    val walks = Seq(
        (1L, 1, 0, 10L), (1L, 1, 1, 11L), (1L, 1, 2, 12L),
        (1L, 1, 3, 13L), (2L, 1, 0, 20L), (2L, 1, 1, 21L))
      .toDF("start", "walk", "step", "node")
    val got = Graph.walkSkipGrams(walks, window = 2)
      .collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getInt(2))).toSet
    val want = Set(
      (10L, 11L, 1), (10L, 12L, 2), (11L, 10L, -1), (11L, 12L, 1),
      (11L, 13L, 2), (12L, 10L, -2), (12L, 11L, -1), (12L, 13L, 1),
      (13L, 11L, -2), (13L, 12L, -1), (20L, 21L, 1), (21L, 20L, -1))
    assert(got == want, s"pair mismatch: got ${got.size} want 12")
    // window 1 drops exactly the |offset|=2 pairs
    assert(Graph.walkSkipGrams(walks, window = 1).count() ==
      want.count(p => math.abs(p._3) <= 1))
    intercept[IllegalArgumentException] {
      Graph.walkSkipGrams(walks, window = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.walkSkipGrams(walks.drop("node"), window = 1)
    }
  }

  test("index-shape invariance: the serve-shaped edge index (range src " +
      "+ bloom dst) returns the identical egonet, sample, and metapath " +
      "as the regular dual index") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    def via(idx: graft.Index): (Set[(Long, Int)], Set[(Int, Long, Long)],
        Set[(Int, String, Long, Long)]) = (
      Graph.neighborhood(idx, "src", "dst", Seq(3L, 7L), hops = 2,
          direction = "both")
        .collect().map(r0 => (r0.getLong(0), r0.getInt(1))).toSet,
      Graph.sampleNeighbors(idx, "src", "dst", Seq(3L, 7L),
          fanouts = Seq(5, 3))
        .collect().map(r0 =>
          (r0.getInt(0), r0.getLong(1), r0.getLong(2))).toSet,
      Graph.sampleMetapath(idx, "src", "dst", "etype", Seq(3L, 7L),
          path = Seq(("c2o", 5), ("o2s", 3)))
        .collect().map(r0 =>
          (r0.getInt(0), r0.getString(1), r0.getLong(2), r0.getLong(3)))
        .toSet)
    // serving warm-up is callable, idempotent, and changes nothing
    lk.edgesServeIdx.warmProbeCache()
    lk.edgesServeIdx.warmProbeCache()
    val serve = via(lk.edgesServeIdx)
    assert(Graph.lastNeighborhoodProbes.forall { case (l, t) => l <= t })
    assert(serve == via(lk.edgesIdx),
      "pruning may only over-approximate: serving results must be " +
        "identical whatever the index shape")
  }

  test("persistScoresIndexed: threshold serving is pruned and " +
      "value-identical to the unindexed filter; full span reads all") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    val edges = lk.lineitem
      .join(lk.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + lit(1000000L)).as("src"),
        col("o_custkey").as("dst"))
      .distinct()
    val scores = Graph.pageRank(edges, "src", "dst", iters = 3)
    val dirX = tmpDir("graft_scores_")
    val idx = Graph.persistScoresIndexed(spark, dirX, scores,
      "pagerank", nBuckets = 8, indexName = "spec_scores_idx")
    val tau = scores.agg(expr("percentile(pagerank, 0.9)"))
      .first().getDouble(0)
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      val got = idx.queryRange("pagerank", tau, 1.0)
        .select("node", "pagerank").collect()
        .map(r0 => (r0.getLong(0), r0.getDouble(1))).toSet
      val m = idx.pruningMetrics.get
      // tied quantile cuts collapse bands (the dangling customers share
      // one rank at this SF) — at least SOME spread must survive
      assert(m.totalFiles >= 2,
        s"quantile banding must spread the scores over files: $m")
      assert(m.locatedFiles < m.totalFiles,
        s"the top-decile read must prune band files: $m")
      val want = scores.where(col("pagerank") >= tau)
        .collect().map(r0 => (r0.getLong(0), r0.getDouble(1))).toSet
      assert(want.nonEmpty && got == want,
        s"indexed threshold read mismatch: got ${got.size} want " +
          s"${want.size}")
      // the full span serves the whole persisted universe
      assert(idx.queryRange("pagerank", 0.0, 1.0).count() ==
        scores.count())
      // re-persist replaces (train-once/overwrite semantics)
      val idx2 = Graph.persistScoresIndexed(spark, dirX, scores,
        "pagerank", nBuckets = 4, indexName = "spec_scores_idx")
      assert(idx2.queryRange("pagerank", 0.0, 1.0).count() ==
        scores.count())
    } finally spark.conf.unset("spark.graft.metricsEnabled")
  }

  test("serving probe stats are per-thread: a concurrent serving call " +
      "does not clobber this thread's pruning evidence") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    Graph.neighborhood(lk.edgesIdx, "src", "dst", Seq(3L), hops = 1,
      direction = "out")
    val mine = Graph.lastNeighborhoodProbes
    assert(mine.nonEmpty)
    // another thread runs its own serving call (different probe shape:
    // one induceEdges locate) — under the old JVM-global slot this
    // overwrote our evidence and a pruning assertion could read another
    // call's stats
    var otherSaw: Seq[(Int, Int)] = Nil
    val t = new Thread(() => {
      graft.operators.Graph.induceEdges(lk.edgesIdx, "src", "dst",
        Seq(3L, 7L)).count()
      otherSaw = Graph.lastNeighborhoodProbes
    })
    t.start(); t.join()
    assert(otherSaw.size == 1, "the other thread sees its own one-probe stats")
    assert(Graph.lastNeighborhoodProbes == mine,
      "this thread's probe evidence must survive the concurrent call")
  }

  test("node2vecWalks: driver replay of the 3-case α bias (return / " +
      "prev-neighbor / explore); p=q=1 is bit-identical to the weighted " +
      "randomWalks corpus; guards") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // a graph where all three α cases fire: from 2 (arrived from 1) the
    // candidates are 1 (return), 3 (1's neighbor), 4 (explore)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 4L), (1L, 3L),
      (3L, 1L), (4L, 2L), (3L, 4L)).toDF("s", "t")
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L, 4L),
      3L -> Seq(1L, 4L), 4L -> Seq(2L))
    val (p0, q0) = (4.0, 0.25)
    def key(cur: Long, v: Long, prev: Option[Long], st: Int): Double = {
      val u = (java.lang.Long.parseLong(
        md5hex(s"7#$cur#$v#1#$st").take(8), 16) + 1L).toDouble /
        4294967297.0
      val alpha = prev match {
        case None => 1.0
        case Some(pv) if v == pv => 1.0 / p0
        case Some(pv) if adj.getOrElse(pv, Seq.empty).contains(v) => 1.0
        case _ => 1.0 / q0
      }
      math.log(1.0 * alpha) - math.log(-math.log(u))
    }
    val want = scala.collection.mutable.Map[(Long, Int, Int), Long]()
    for (start <- adj.keys) {
      var cur = start
      var prev: Option[Long] = None
      want((start, 1, 0)) = start
      (1 to 4).foreach { st =>
        val v = adj(cur).minBy(n => (-key(cur, n, prev, st), n))
        want((start, 1, st)) = v
        prev = Some(cur); cur = v
      }
    }
    val got = Graph.node2vecWalks(edges, "s", "t", walkLength = 4,
        walksPerNode = 1, p = p0, q = q0, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    assert(got == want.toMap, "node2vec replay mismatch")
    // the replay must actually exercise a biased choice: with p=4 the
    // walk from 1→2 must not immediately return unless the hash draw
    // overwhelms the 0.25 factor — assert the fixture covers a step
    // where the unbiased (p=q=1) walk differs from the biased one
    val unb = Graph.node2vecWalks(edges, "s", "t", walkLength = 4,
        walksPerNode = 1, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    assert(unb != got,
      "fixture must make the p/q bias change at least one draw")
    // p=q=1 degrades bit-identically to the weighted randomWalks draw
    // (α ≡ 1 leaves every Gumbel key untouched — two independent code
    // paths, same corpus)
    val wEdges = Seq((1L, 2L, 1.0), (1L, 3L, 5.0), (1L, 3L, 2.0),
      (3L, 1L, 1.0), (3L, 4L, 2.0), (4L, 1L, 3.0)).toDF("s", "t", "w")
    val viaN2v = Graph.node2vecWalks(wEdges, "s", "t", walkLength = 3,
        walksPerNode = 2, samplingSeed = 7L, weightCol = Some("w"))
      .collect().map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    val viaRw = Graph.randomWalks(wEdges, "s", "t", walkLength = 3,
        walksPerNode = 2, samplingSeed = 7L, weightCol = Some("w"))
      .collect().map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    assert(viaN2v == viaRw,
      "p=q=1 node2vec must equal the weighted randomWalks corpus")
    intercept[IllegalArgumentException] {
      Graph.node2vecWalks(edges, "s", "t", walkLength = 2, p = 0.0)
    }
    intercept[IllegalArgumentException] {
      Graph.node2vecWalks(edges, "s", "t", walkLength = 2, q = -1.0)
    }
  }

  test("persistScoresIndexed: a file:-scheme dir routes through the " +
      "Hadoop FS listing; approx KLL banding serves value-identically") {
    val scores = spark.range(1, 201)
      .select(col("id").as("node"), (col("id") / lit(200.0)).as("score"))
    // file:// URI — the java.io.File enumeration this replaced NPE'd here
    val dirX = "file:" + tmpDir("graft_scores_uri_")
    val idx = Graph.persistScoresIndexed(spark, dirX, scores, "score",
      nBuckets = 4, indexName = "spec_scores_uri")
    assert(idx.queryRange("score", 0.0, 1.0).count() == 200L)
    val wantTop = scores.where(col("score") >= 0.9)
      .collect().map(r0 => (r0.getLong(0), r0.getDouble(1))).toSet
    val gotTop = idx.queryRange("score", 0.9, 1.0)
      .select("node", "score").collect()
      .map(r0 => (r0.getLong(0), r0.getDouble(1))).toSet
    assert(gotTop == wantTop)
    // approx banding: KLL cuts steer only file PLACEMENT — served rows
    // must be identical to the exact-percentile banding, and the range
    // index must still prune the top-decile read
    val dirY = "file:" + tmpDir("graft_scores_kll_")
    val idxA = Graph.persistScoresIndexed(spark, dirY, scores, "score",
      nBuckets = 4, indexName = "spec_scores_kll", approx = true)
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      val gotA = idxA.queryRange("score", 0.9, 1.0)
        .select("node", "score").collect()
        .map(r0 => (r0.getLong(0), r0.getDouble(1))).toSet
      assert(gotA == wantTop,
        "approx banding must not change served results")
      val m = idxA.pruningMetrics.get
      assert(m.totalFiles >= 2 && m.locatedFiles < m.totalFiles,
        s"KLL-banded top-decile read must prune band files: $m")
    } finally spark.conf.unset("spark.graft.metricsEnabled")
    assert(idxA.queryRange("score", 0.0, 1.0).count() == 200L)
  }

  test("buildServeIndex: the serve-shape recipe as API — idempotent " +
      "incremental reconnect; a conflicting shape hits the exclusivity " +
      "rule") {
    import graft.harness.Lake
    val lk = Lake.get(spark, sf)
    // the invariance test above already pins serving equality through
    // lk.edgesServeIdx (which routes through buildServeIndex); here:
    // reconnect + conflict semantics
    val idx = Graph.buildServeIndex(spark, "edges_serve_idx",
      lk.edgesFiles, "src", "dst")
    assert(idx.indexes == Set("src", "dst"))
    val n1 = idx.files.size
    // re-invoking with the same shape and files is a no-op upsert
    val idx2 = Graph.buildServeIndex(spark, "edges_serve_idx",
      lk.edgesFiles, "src", "dst")
    assert(idx2.files.size == n1,
      "re-registering the same files must not duplicate the ledger")
    // swapped columns ask for bloom-on-src over the existing range-on-src
    intercept[IllegalArgumentException] {
      Graph.buildServeIndex(spark, "edges_serve_idx", lk.edgesFiles,
        "dst", "src")
    }
    intercept[IllegalArgumentException] {
      Graph.buildServeIndex(spark, "spec_serve_missing", lk.edgesFiles,
        "nope", "dst")
    }
  }

  test("walkPmi: hand-computed PPMI with the 0-clip exercised; guards") {
    // pairs: (a,b)x3, (a,c)x1, (c,b)x1 → N=5, n(a,·)=4, n(·,b)=4
    // PMI(a,b)=ln(15/16)<0 → clipped to 0; the others ln(1.25)
    val pairs = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("a", "c"),
      ("c", "b")).toDF("center", "context")
    val got = Graph.walkPmi(pairs).collect()
      .map(r0 => ((r0.getString(0), r0.getString(1)),
        (r0.getLong(2), r0.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      ("a", "b") -> ((3L, 0.0)),
      ("a", "c") -> ((1L, r6(math.log(1.25)))),
      ("c", "b") -> ((1L, r6(math.log(1.25))))))
    intercept[IllegalArgumentException] {
      Graph.walkPmi(pairs, centerCol = "nope")
    }
  }

  test("metapathWalks: driver replay of the type-constrained draws; " +
      "missing-type truncation; single-type path equals randomWalks " +
      "on the typed slice; guards") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val typed = Seq(
      (1L, 2L, "x"), (1L, 3L, "x"), (2L, 4L, "x"),
      (2L, 5L, "y"), (3L, 6L, "y"), (4L, 7L, "y"))
      .toDF("s", "t", "ty")
    val adj = Map(
      "x" -> Map(1L -> Seq(2L, 3L), 2L -> Seq(4L)),
      "y" -> Map(2L -> Seq(5L), 3L -> Seq(6L), 4L -> Seq(7L)))
    val want = scala.collection.mutable.Map[(Long, Int, Int), Long]()
    for (start <- Seq(1L, 2L)) {
      var cur = start
      want((start, 1, 0)) = start
      var alive = true
      (1 to 4).foreach { st =>
        val ty = if (st % 2 == 1) "x" else "y"
        if (alive) adj(ty).get(cur) match {
          case Some(ns) =>
            val v = ns.minBy(n => (md5hex(s"$cur:$n:7:1:$st"), n))
            want((start, 1, st)) = v
            cur = v
          case None => alive = false
        }
      }
    }
    val got = Graph.metapathWalks(typed, "s", "t", "ty",
        path = Seq("x", "y"), cycles = 2, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toMap
    assert(got == want.toMap, "metapath replay mismatch")
    // the y→x transition must actually truncate somewhere (nodes 5/6/7
    // have no x out-edge) or the fixture tests nothing
    assert(want.size < 2 * 5, "expected at least one typed truncation")
    // single-type path over a single-type graph = randomWalks on the
    // same slice (identical derivation strings, two code paths)
    val xOnly = typed.where(col("ty") === "x")
    val viaMp = Graph.metapathWalks(xOnly, "s", "t", "ty",
        path = Seq("x"), cycles = 3, walksPerNode = 2, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toSet
    val viaRw = Graph.randomWalks(xOnly, "s", "t", walkLength = 3,
        walksPerNode = 2, samplingSeed = 7L)
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toSet
    assert(viaMp == viaRw,
      "single-type metapath must equal randomWalks on the typed slice")
    // weighted single-type differential (Gumbel path)
    val wTyped = Seq((1L, 2L, "x", 1.0), (1L, 3L, "x", 5.0),
      (3L, 1L, "x", 2.0)).toDF("s", "t", "ty", "w")
    val viaMpW = Graph.metapathWalks(wTyped, "s", "t", "ty",
        path = Seq("x"), cycles = 2, samplingSeed = 7L,
        weightCol = Some("w"))
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toSet
    val viaRwW = Graph.randomWalks(wTyped, "s", "t", walkLength = 2,
        samplingSeed = 7L, weightCol = Some("w"))
      .collect()
      .map(r0 => ((r0.getLong(0), r0.getInt(1), r0.getInt(2)),
        r0.getLong(3))).toSet
    assert(viaMpW == viaRwW,
      "weighted single-type metapath must equal weighted randomWalks")
    intercept[IllegalArgumentException] {
      Graph.metapathWalks(typed, "s", "t", "ty", path = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Graph.metapathWalks(typed, "s", "t", "ty", Seq("x"), cycles = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.metapathWalks(typed, "s", "t", "nope", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Graph.metapathWalks(
        Seq((1L, 2L, 3L)).toDF("s", "t", "ty"), "s", "t", "ty", Seq("x"))
    }
  }

  test("warmOnConnect: reconnecting under spark.graft.warmOnConnect " +
      "warms the probe cache and probes are unchanged") {
    val dirX = tmpDir("graft_warm_")
    spark.range(0, 100).select(col("id"), (col("id") % 7).as("grp"))
      .write.mode("overwrite").parquet(dirX)
    val files = new java.io.File(dirX).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val schema = spark.read.parquet(files.head).schema
    val i1 = graft.Index(spark, "spec_warm_idx", schema, "parquet")
    i1.addIndex("grp")
    i1.addFile(files: _*)
    i1.update()
    spark.conf.set("spark.graft.warmOnConnect", "true")
    try {
      // reconnect: the warm-up fires inside Index() — behavior must be
      // identical, just pre-paid
      val i2 = graft.Index(spark, "spec_warm_idx", schema, "parquet")
      assert(i2.query(Map("grp" -> Seq(3L))).where(col("grp") === 3)
        .count() === spark.range(0, 100).where(col("id") % 7 === 3).count())
    } finally spark.conf.unset("spark.graft.warmOnConnect")
  }

  test("pageRank + duplicateClusters: reliable-checkpoint escape hatch " +
      "(spark.graft.reliableCheckpointDir) yields identical results") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L),
      (7L, 7L), (5L, 6L))
    val df = edges.toDF("s", "t")
    val local = Graph.pageRank(df, "s", "t", iters = 6)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
    val pairsDf = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val ccLocal = graft.operators.Dedup.duplicateClusters(pairsDf)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    val dir = tmpDir("graft_reliable_ckpt_")
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try {
      val reliable = Graph.pageRank(df, "s", "t", iters = 6)
        .collect().map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap
      assert(reliable == local) // bit-identical ranks either medium
      val ccReliable = graft.operators.Dedup.duplicateClusters(pairsDf)
        .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
      assert(ccReliable == ccLocal)
      // the hatch really routed through the DFS dir: RDD checkpoint
      // files must exist under it
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        s"no reliable checkpoint data written under $dir")
    } finally spark.conf.unset("spark.graft.reliableCheckpointDir")
  }
}
