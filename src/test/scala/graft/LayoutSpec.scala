package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.ZValueExpr
import graft.operators.Layout

/** Z-order layout: the interleave arithmetic (codegen vs an independent
  * per-bit reference), bucket edge cases, and the point of the whole
  * exercise — a measured file-pruning differential against a
  * lexicographic layout on the same data. */
class LayoutSpec extends GraftSuite {
  import spark.implicits._

  /** Independent reference interleave: bit strings, not shifts. */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val k = vals.size
    var acc = 0L
    for (i <- 0 until bits; j <- 0 until k) {
      if (((vals(j) >> i) & 1L) == 1L) acc |= 1L << (i * k + (k - 1 - j))
    }
    acc
  }

  test("weave matches an independent per-bit reference (3 cols)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val bits = 1 + rnd.nextInt(20)
      val vs = Seq.fill(3)(rnd.nextLong().abs % (1L << bits))
      val got = vs.zipWithIndex.map { case (v, j) =>
        ZValueExpr.weave(v, bits, 3, j)
      }.reduce(_ | _)
      assert(got == refZ(vs, bits))
    }
  }

  test("zValue expression: codegen output equals driver reference") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      Layout.zValue(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == refZ(Seq(a, b), 8), s"($a,$b)")
    }
    // column 0 owns the high bit of each pair
    assert(got.find(t => t._1 == 1L && t._2 == 0L).get._3 == 2L)
    assert(got.find(t => t._1 == 0L && t._2 == 1L).get._3 == 1L)
  }

  test("zValue: null in, null out; non-null path unaffected") {
    val df = Seq((Some(3L), 5L), (None, 5L)).toDF("a", "b")
    val rows = df.select(Layout.zValue(Seq(col("a"), col("b")), 4).as("z"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("zValue rejects bad inputs with clear errors") {
    val df = Seq((1L, "x")).toDF("a", "s")
    val e = intercept[Exception] {
      df.select(Layout.zValue(Seq(col("a"), col("s")), 8)).collect()
    }
    assert(e.getMessage.contains("bigint"))
    val e2 = intercept[Exception] {
      df.select(Layout.zValue(Seq(col("a"), col("a")), 40)).collect()
    }
    assert(e2.getMessage.contains("63"))
  }

  test("fixedPointBucket: clamp, constant column, null passthrough") {
    val df = Seq(Some(0.0), Some(50.0), Some(100.0), None).toDF("x")
    val b = df.select(
      Layout.fixedPointBucket(col("x"), 0.0, 100.0, 8).as("b")).collect()
    assert(b(0).getLong(0) == 0L)
    assert(b(1).getLong(0) == 128L)
    assert(b(2).getLong(0) == 255L) // max clamps into range
    assert(b(3).isNullAt(0))
    val const = df.select(
      Layout.fixedPointBucket(col("x"), 7.0, 7.0, 8).as("b")).collect()
    assert(const(0).getLong(0) == 0L && const(3).isNullAt(0))
  }

  test("withZValue round-trips through a driver-side recompute") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val z = Layout.withZValue(ev, Seq("user_id", "value"), bits = 8)
    val Array(mnU, mxU, mnV, mxV) = ev.agg(
      min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("value")), max(col("value"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    def bucket(x: Double, mn: Double, mx: Double): Long =
      math.min(255L, math.max(0L,
        math.floor((x - mn) / (mx - mn) * 256.0).toLong))
    val rows = z.select("user_id", "value", "z_value").limit(500).collect()
    rows.foreach { r =>
      val want = refZ(Seq(bucket(r.getLong(0).toDouble, mnU, mxU),
        bucket(r.getDouble(1), mnV, mxV)), 8)
      assert(r.getLong(2) == want)
    }
  }

  test("z-order layout prunes a secondary-column box; lexicographic cannot") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "value")
    val nFiles = 16
    val zDir = tmpDir("layout_z")
    val lexDir = tmpDir("layout_lex")
    Layout.zorderBy(ev, Seq("user_id", "value"), bits = 8, numFiles = nFiles)
      .write.mode("overwrite").parquet(zDir)
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(lexDir)

    // per-file [min,max] of the SECONDARY column, from the data itself
    def valueSpans(dir: String): Seq[(Double, Double)] =
      spark.read.parquet(dir)
        .select(col("value"), input_file_name().as("f"))
        .groupBy("f").agg(min("value").as("mn"), max("value").as("mx"))
        .collect().toSeq.map(r => (r.getDouble(1), r.getDouble(2)))

    val Array(lo, hi) = ev.agg(min("value"), max("value")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    // a 10%-of-range box on `value` alone
    val boxLo = lo + 0.45 * (hi - lo)
    val boxHi = lo + 0.55 * (hi - lo)
    def touched(spans: Seq[(Double, Double)]): Int =
      spans.count { case (mn, mx) => mx >= boxLo && mn <= boxHi }

    val zt = touched(valueSpans(zDir))
    val lt = touched(valueSpans(lexDir))
    // user_id-sorted files span ~the full value domain → near-zero
    // pruning; z-ordered files are value-clustered too → most skipped
    assert(lt >= nFiles * 3 / 4, s"lex layout unexpectedly pruned: $lt")
    assert(zt <= nFiles / 2 && zt < lt,
      s"z layout should skip most files for a 10% box, touched $zt/$nFiles" +
        s" (lex touched $lt)")
  }

  test("zorderBy output schema drops the helper column") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val out = Layout.zorderBy(ev, Seq("user_id", "value"), bits = 8,
      numFiles = 4)
    assert(out.columns.toSeq == ev.columns.toSeq)
    assert(out.count() == ev.count())
  }

  test("hilbert xy2d: known order-1/2 curves, bijective, grid-adjacent") {
    import graft.functions.HilbertIndexExpr.xy2d
    // the canonical order-1 curve: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3
    assert(xy2d(1, 0, 0) == 0 && xy2d(1, 0, 1) == 1 &&
      xy2d(1, 1, 1) == 2 && xy2d(1, 1, 0) == 3)
    // order-2: starts (0,0)→0, (1,0)→1 (first rotation), ends (3,0)→15
    assert(xy2d(2, 0, 0) == 0 && xy2d(2, 1, 0) == 1 && xy2d(2, 3, 0) == 15)
    // order-4 over the full 16×16 grid: a bijection onto 0..255 whose
    // consecutive positions are ALWAYS grid neighbors — the locality
    // property the Z curve gives up at power-of-two seams
    val grid = for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, xy2d(4, x, y))
    assert(grid.map(_._3).sorted == (0L until 256L))
    val byD = grid.map(t => t._3 -> (t._1, t._2)).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and ${d + 1} ($x2,$y2)")
    }
    // Z takes 87 non-adjacent steps on the same grid (measured here so
    // the comparison is pinned, not asserted rhetorically)
    val zByD = grid.map { case (x, y, _) =>
      refZ(Seq(x.toLong, y.toLong), 4) -> (x, y) }.toMap
    val zJumps = (0L until 255L).count { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "z-order must have non-adjacent steps for contrast")
  }

  test("hilbert expression: codegen equals driver walk; null propagates") {
    val df = Seq((Some(0L), 0L), (Some(170L), 85L), (Some(255L), 255L),
      (None, 7L)).toDF("x", "y")
    val rows = df.select(col("x"), col("y"),
      graft.functions.HilbertIndexExpr.hilbertIndex(
        col("x"), col("y"), 8).as("h")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(2))
      else assert(r.getLong(2) ==
        graft.functions.HilbertIndexExpr.xy2d(8, r.getLong(0), r.getLong(1)))
    }
  }

  test("hilbertBy: schema preserved; prunes the secondary box at least as well as z") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "value")
    val nFiles = 16
    val hDir = tmpDir("layout_h")
    val zDir = tmpDir("layout_z2")
    Layout.hilbertBy(ev, "user_id", "value", bits = 8, numFiles = nFiles)
      .write.mode("overwrite").parquet(hDir)
    Layout.zorderBy(ev, Seq("user_id", "value"), bits = 8, numFiles = nFiles)
      .write.mode("overwrite").parquet(zDir)
    val out = Layout.hilbertBy(ev, "user_id", "value", bits = 8,
      numFiles = 4)
    assert(out.columns.toSeq == ev.columns.toSeq)
    assert(spark.read.parquet(hDir).count() == ev.count())
    def touched(dir: String, boxLo: Double, boxHi: Double): Int =
      spark.read.parquet(dir)
        .select(col("value"), input_file_name().as("f"))
        .groupBy("f").agg(min("value").as("mn"), max("value").as("mx"))
        .collect().count(r => r.getDouble(2) >= boxLo && r.getDouble(1) <= boxHi)
    val Array(lo, hi) = ev.agg(min("value"), max("value")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val (boxLo, boxHi) = (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
    val ht = touched(hDir, boxLo, boxHi)
    val zt = touched(zDir, boxLo, boxHi)
    assert(ht <= nFiles / 2,
      s"hilbert layout should skip most files, touched $ht/$nFiles")
    assert(ht <= zt + 2,
      s"hilbert should not prune materially worse than z: h=$ht z=$zt")
  }

  test("writeBucketed: a both-sides-bucketed equi-join and a bucket-key " +
      "groupBy run with ZERO shuffle exchanges; results match the " +
      "shuffled plan") {
    import spark.implicits._
    val facts = (0L until 10000L).map(i => (i % 512, i, (i % 97).toDouble))
      .toDF("k", "row_id", "v")
    val dims = (0L until 512L).map(i => (i, s"dim_$i")).toDF("k", "name")
    val fDir = tmpDir("bkt_facts_")
    val dDir = tmpDir("bkt_dims_")
    spark.sql("DROP TABLE IF EXISTS bkt_facts")
    spark.sql("DROP TABLE IF EXISTS bkt_dims")
    Layout.writeBucketed(facts, "bkt_facts", Seq("k"), numBuckets = 8,
      sortCols = Seq("k"), path = Some(fDir))
    Layout.writeBucketed(dims, "bkt_dims", Seq("k"), numBuckets = 8,
      path = Some(dDir))
    // bucketed scans must satisfy the join's distribution directly
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("bkt_facts")
        .join(spark.table("bkt_dims"), Seq("k"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(Layout.shuffleCount(
        spark.table("bkt_facts").join(spark.table("bkt_dims"), Seq("k"))
      ) == 0, "bucketed-bucketed join must plan no exchange")
      val plain = facts.join(dims, Seq("k"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(Layout.shuffleCount(facts.join(dims, Seq("k"))) > 0,
        "the unbucketed control join should shuffle")
      assert(bucketed.collect().toSeq == plain.collect().toSeq)
      // aggregation on the bucket key: no exchange either
      val gb = spark.table("bkt_facts").groupBy("k")
        .agg(sum("v").as("s"))
      assert(Layout.shuffleCount(gb) == 0,
        "bucket-key groupBy must plan no exchange")
      assertSameRows(gb, facts.groupBy("k").agg(sum("v").as("s")))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("shuffleCount: a broadcast join is shuffle-free (BroadcastExchange " +
      "is data movement, not a repartition) — the 0-certificate holds " +
      "under DEFAULT broadcast settings") {
    import spark.implicits._
    val facts = (0L until 2000L).map(i => (i % 64, i)).toDF("k", "row_id")
    val dims = (0L until 64L).map(i => (i, s"d_$i")).toDF("k", "name")
    // defaults: the 64-row dim broadcasts; the plan has a
    // BroadcastExchange node but moves no fact rows
    val bj = facts.join(dims, Seq("k"))
    val plan = bj.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"fixture must actually broadcast:\n$plan")
    assert(Layout.shuffleCount(bj) == 0,
      "a broadcast hash join repartitions nothing — must not count " +
        "against the shuffle-free certificate")
    // control: the same join forced to sort-merge DOES count
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(Layout.shuffleCount(facts.join(dims, Seq("k"))) > 0)
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
