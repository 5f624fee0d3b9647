package graft

import org.apache.spark.sql.functions._

/** Cost-aware multi-column probe ordering: HLL distinct-stats sidecars
  * ride the index build, score each probed column's expected per-file
  * hit rate, the AND-intersection probes most-selective-first, and the
  * short-circuit skips remaining probes once the running candidate set
  * is at or below the configured floor. Results must be IDENTICAL to
  * the fixed-order intersection (pruning may only over-approximate, and
  * residual filters keep row sets exact). */
class ProbeOrderSpec extends GraftSuite {
  import spark.implicits._

  /** 8 files; `hi` unique per row (a single probe value lives in exactly
    * ONE file), `lo` two distinct values BOTH present in every file (a
    * probe on it prunes nothing). Returns the index. */
  private def skewedLake(name: String): Index = {
    val dir = tmpDir("probeorder_")
    val files = (0 until 8).map { f =>
      val p = s"$dir/f$f"
      (0 until 100).map(i => (f * 100L + i, if (i % 2 == 0) "a" else "b",
          s"row_${f}_$i"))
        .toDF("hi", "lo", "payload").coalesce(1).write.parquet(p)
      new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    }
    val idx = Index(spark, name,
      Seq((0L, "a", "x")).toDF("hi", "lo", "payload").schema, "parquet")
    idx.addIndex("hi")
    idx.addIndex("lo")
    idx.addFile(files: _*)
    idx.update()
    idx
  }

  test("sidecar sketches are built per membership index into the " +
      "SEPARATE stats table (the hot index table stays lean) and " +
      "estimate per-file and global distincts") {
    val idx = skewedLake("po_sidecar")
    try {
      val store = new graft.store.IndexStore(spark, "po_sidecar")
      // the hot table every probe scans must NOT carry the sketches
      assert(!store.indexTable.read().get.columns
        .exists(_.startsWith("hll_stats_")),
        "stats sidecars must not widen the cached index table")
      val tbl = store.statsTable.read().get
      assert(tbl.columns.contains("hll_stats_hi") &&
        tbl.columns.contains("hll_stats_lo"))
      val est = tbl.agg(
        avg(call_function("hll_sketch_estimate", col("hll_stats_hi")))
          .as("avg_hi"),
        call_function("hll_sketch_estimate",
          call_function("hll_union_agg", col("hll_stats_hi"), lit(true)))
          .as("u_hi"),
        avg(call_function("hll_sketch_estimate", col("hll_stats_lo")))
          .as("avg_lo"),
        call_function("hll_sketch_estimate",
          call_function("hll_union_agg", col("hll_stats_lo"), lit(true)))
          .as("u_lo")).first()
      // hi: ~100 per file, ~800 global; lo: 2 per file, 2 global
      assert(math.abs(est.getDouble(0) - 100.0) < 5.0, est.toString)
      assert(math.abs(est.getLong(1) - 800L) < 40L, est.toString)
      assert(est.getDouble(2) == 2.0 && est.getLong(3) == 2L, est.toString)
    } finally Index.remove(spark, "po_sidecar")
  }

  test("multi-column AND probes the selective column first and " +
      "short-circuits the unselective one; result identical to the " +
      "fixed-order intersection") {
    val idx = skewedLake("po_order")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      // hi=42 lives only in file 0; lo='a' lives in all 8 files
      graft.operators.IndexProbe.lastProbeTrace = None
      val located = idx.locateFiles(Map(
        "lo" -> Seq("a"), "hi" -> Seq(42L)))
      assert(located.size == 1, s"want the single file, got $located")
      val trace = graft.operators.IndexProbe.lastProbeTrace.get
      assert(trace.map(_.column) == Seq("hi", "lo"),
        s"selective column must probe first: $trace")
      assert(trace.head.candidates == 1L && !trace.head.skipped)
      assert(trace(1).skipped,
        s"1-file candidate set must short-circuit the lo probe: $trace")

      // parity with the fixed-order path (ordering disabled)
      spark.conf.set("spark.graft.probeOrderingEnabled", "false")
      val legacy = idx.locateFiles(Map("lo" -> Seq("a"), "hi" -> Seq(42L)))
      assert(legacy.toSet == located.toSet)
      assert(graft.operators.IndexProbe.lastProbeTrace.isEmpty)
      spark.conf.unset("spark.graft.probeOrderingEnabled")

      // row-level results agree between orderings (the exactness
      // contract: pruning differences never change answers)
      val got = idx.query(Map("lo" -> Seq("a"), "hi" -> Seq(42L)))
        .select("hi", "lo", "payload")
      assert(got.collect().map(_.getLong(0)).toSeq == Seq(42L))
    } finally {
      spark.conf.set("spark.graft.metricsEnabled", "false")
      Index.remove(spark, "po_order")
    }
  }

  test("empty intersection short-circuits after the first probe; an " +
      "unselective-first probe still intersects fully when no " +
      "short-circuit applies") {
    val idx = skewedLake("po_empty")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      // absent hi value: first (selective) probe yields 0 candidates,
      // second is skipped
      graft.operators.IndexProbe.lastProbeTrace = None
      val located = idx.locateFiles(Map(
        "lo" -> Seq("a"), "hi" -> Seq(-1L)))
      assert(located.isEmpty)
      val trace = graft.operators.IndexProbe.lastProbeTrace.get
      assert(trace.head.column == "hi" && trace.head.candidates == 0L)
      assert(trace(1).skipped)

      // floor 0: the lo probe must now RUN (1 candidate > 0) and the
      // intersection stays tight
      spark.conf.set("spark.graft.probeShortCircuitFiles", "0")
      graft.operators.IndexProbe.lastProbeTrace = None
      val both = idx.locateFiles(Map("lo" -> Seq("a"), "hi" -> Seq(42L)))
      assert(both.size == 1)
      val t2 = graft.operators.IndexProbe.lastProbeTrace.get
      assert(t2.forall(!_.skipped), s"floor 0 must run both probes: $t2")
      assert(t2.map(_.column) == Seq("hi", "lo"))
    } finally {
      spark.conf.unset("spark.graft.probeShortCircuitFiles")
      spark.conf.set("spark.graft.metricsEnabled", "false")
      Index.remove(spark, "po_empty")
    }
  }

  test("stores built without sidecars keep the fixed order (no trace, " +
      "same results)") {
    spark.conf.set("spark.graft.statsSidecars", "false")
    val idx =
      try skewedLake("po_nosidecar")
      finally spark.conf.unset("spark.graft.statsSidecars")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      assert(!new graft.store.IndexStore(spark, "po_nosidecar")
        .statsTable.exists)
      graft.operators.IndexProbe.lastProbeTrace = None
      val located = idx.locateFiles(Map("lo" -> Seq("a"), "hi" -> Seq(42L)))
      assert(located.size == 1)
      assert(graft.operators.IndexProbe.lastProbeTrace.isEmpty,
        "no sidecars -> legacy single-plan path, no trace")
    } finally {
      spark.conf.set("spark.graft.metricsEnabled", "false")
      Index.remove(spark, "po_nosidecar")
    }
  }
}
