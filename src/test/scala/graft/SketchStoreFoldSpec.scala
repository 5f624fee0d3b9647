package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** The epoch-store fold (r9 verdict item #1): past `maxEpochs` registered
  * epochs, aged epochs consolidate under one sentinel epoch so view cost
  * and store size are flat in stream lifetime. These specs pin:
  *   - fold-vs-unfolded view EQUIVALENCE (the re-merge is associative);
  *   - replay safety across the fold boundary (an epoch already folded is
  *     dropped by the watermark — exactly once either way);
  *   - bounded store size after many epochs;
  *   - true-count rendering surviving both the fold and the estimating
  *     regime (r9 verdict item #3);
  *   - pre-r10 store schema upgrade (no `n_rows` column);
  *   - the same discipline on the Misra–Gries and HLL stores.
  */
class SketchStoreFoldSpec extends GraftSuite {
  import spark.implicits._

  private def exactDisc(sorted: Seq[Double], q: Double): Double = {
    val target = math.max(1L, math.ceil(q * sorted.length).toLong)
    sorted((target - 1).toInt)
  }

  private def itemRows(store: String): Long =
    new graft.store.SnapshotTable(spark, s"$store/items").read()
      .map(_.count()).getOrElse(0L)

  private def epochsIn(store: String, table: String = "items"): Seq[String] =
    new graft.store.SnapshotTable(spark, s"$store/$table").read()
      .map(_.select("batch_id").distinct().collect()
        .map(_.getString(0)).sorted.toSeq)
      .getOrElse(Seq.empty)

  test("KLL fold: 14 epochs at maxEpochs=4 — view equals the unfolded " +
      "store and the exact quantiles; store size is bounded") {
    val rng = new scala.util.Random(101)
    val folded = tmpDir("fold_kll_")
    val plain = tmpDir("nofold_kll_")
    val all = scala.collection.mutable.ArrayBuffer[Double]()
    (0 until 14).foreach { e =>
      val vals = Seq.fill(200)(math.floor(rng.nextDouble() * 500))
      all ++= vals
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v", folded,
        k = 8192, batchId = e.toLong, maxEpochs = 4)
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v", plain,
        k = 8192, batchId = e.toLong, maxEpochs = 0)
    }
    val probs = Seq(0.1, 0.5, 0.9)
    val got = Profile.quantileSketchView(spark, folded, probs, k = 8192)
    val want = Profile.quantileSketchView(spark, plain, probs, k = 8192)
    assertSameRows(got, want)
    // exact regime: both equal quantile_disc over all epochs' values
    val sorted = all.sorted.toSeq
    val gotMap = got.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    probs.foreach(q => assert(gotMap(q) == exactDisc(sorted, q), s"q=$q"))
    // bounded: the folded store holds <= maxEpochs real epochs + sentinel,
    // the unfolded one all 14
    val fe = epochsIn(folded)
    assert(fe.contains(Profile.FoldedEpochId), s"no sentinel in $fe")
    assert(fe.size <= 5, s"folded store kept too many epochs: $fe")
    assert(epochsIn(plain).size == 14)
    // exact regime: the fold keeps every survivor (that's what makes it
    // lossless), so sizes only tie; never more
    assert(itemRows(folded) <= itemRows(plain))
  }

  test("KLL fold bounds store size in the estimating regime: 30 epochs " +
      "at k=128 stay O(maxEpochs x k log) items while the unfolded " +
      "store grows linearly") {
    val rng = new scala.util.Random(113)
    val folded = tmpDir("fold_size_")
    val plain = tmpDir("nofold_size_")
    (0 until 30).foreach { e =>
      val vals = Seq.fill(3000)(rng.nextDouble())
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v", folded,
        k = 128, batchId = e.toLong, maxEpochs = 8)
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v", plain,
        k = 128, batchId = e.toLong, maxEpochs = 0)
    }
    val (fr, pr) = (itemRows(folded), itemRows(plain))
    assert(fr < pr / 2, s"fold must cap growth: folded=$fr unfolded=$pr")
    // the folded store is <= (kept epochs + 1 consolidated) sketches of
    // k x levels items each; 3000-row epochs at k=128 stay under ~12
    // levels, so 10 x 128 x 12 is a generous ceiling
    assert(fr <= 10L * 128 * 12, s"folded store too large: $fr")
    // the merged view still tracks the true quantiles within the envelope
    val med = Profile.quantileSketchView(spark, folded, Seq(0.5), k = 128)
      .collect().head.getDouble(1)
    assert(math.abs(med - 0.5) < 0.05, s"median of U(0,1) ~ 0.5, got $med")
  }

  test("KLL fold replay safety: an epoch already consolidated is DROPPED " +
      "(poisoned redelivery cannot double-count or corrupt); a kept epoch " +
      "still replaces") {
    val store = tmpDir("fold_replay_")
    (0 until 10).foreach { e =>
      Profile.quantileSketchIncrementalBatch(
        Seq.fill(100)(e.toDouble).toDF("v"), "v", store,
        k = 4096, batchId = e.toLong, maxEpochs = 4)
    }
    val before = Profile.quantileSketchView(spark, store,
      Seq(0.1, 0.5, 0.9), k = 4096).collect().toSeq
    // epoch 0 was folded long ago: redeliver it with DIFFERENT data —
    // the watermark must drop it entirely
    Profile.quantileSketchIncrementalBatch(
      Seq.fill(100)(9999.0).toDF("v"), "v", store,
      k = 4096, batchId = 0L, maxEpochs = 4)
    val afterFoldedReplay = Profile.quantileSketchView(spark, store,
      Seq(0.1, 0.5, 0.9), k = 4096).collect().toSeq
    assert(afterFoldedReplay == before,
      "replay of a folded epoch must be dropped")
    // epoch 9 is still individually keyed: deterministic redelivery
    // replaces its registration, view unchanged
    Profile.quantileSketchIncrementalBatch(
      Seq.fill(100)(9.0).toDF("v"), "v", store,
      k = 4096, batchId = 9L, maxEpochs = 4)
    val afterKeptReplay = Profile.quantileSketchView(spark, store,
      Seq(0.1, 0.5, 0.9), k = 4096).collect().toSeq
    assert(afterKeptReplay == before)
  }

  test("keyed KLL fold: per-key views and keyed drift equal the unfolded " +
      "store across the fold boundary") {
    val rng = new scala.util.Random(103)
    val folded = tmpDir("fold_keyed_")
    val plain = tmpDir("nofold_keyed_")
    (0 until 12).foreach { e =>
      val rows = Seq.fill(150)(
        (if (rng.nextBoolean()) "a" else "b",
          math.floor(rng.nextDouble() * 300)))
      Profile.quantileSketchIncrementalBatchByKey(rows.toDF("g", "v"), "v",
        Seq("g"), folded, k = 8192, batchId = e.toLong, maxEpochs = 4)
      Profile.quantileSketchIncrementalBatchByKey(rows.toDF("g", "v"), "v",
        Seq("g"), plain, k = 8192, batchId = e.toLong, maxEpochs = 0)
    }
    assertSameRows(
      Profile.quantileSketchViewByKey(spark, folded, Seq("g"),
        Seq(0.25, 0.5, 0.75), k = 8192),
      Profile.quantileSketchViewByKey(spark, plain, Seq("g"),
        Seq(0.25, 0.5, 0.75), k = 8192))
    // keyed drift folded-vs-folded == unfolded-vs-unfolded (same data)
    assertSameRows(
      Profile.driftByKeyFromSketchStores(spark, folded, folded, Seq("g"),
        nBins = 4, k = 8192),
      Profile.driftByKeyFromSketchStores(spark, plain, plain, Seq("g"),
        nBins = 4, k = 8192))
    assert(epochsIn(folded).size <= 5)
  }

  test("true-count rendering (estimating regime, n >> k): drift n_ref / " +
      "n_cur sum to the TRUE ingested counts, not survivor weight") {
    val rng = new scala.util.Random(107)
    val refStore = tmpDir("truen_ref_")
    val curStore = tmpDir("truen_cur_")
    // 3 epochs x 7000 rows at k=256: deep in the estimating regime
    (0 until 3).foreach { e =>
      Profile.quantileSketchIncrementalBatch(
        Seq.fill(7000)(rng.nextGaussian()).toDF("v"), "v", refStore,
        k = 256, batchId = e.toLong)
      Profile.quantileSketchIncrementalBatch(
        Seq.fill(5000)(rng.nextGaussian() + 0.3).toDF("v"), "v", curStore,
        k = 256, batchId = e.toLong)
    }
    val got = Profile.driftFromSketchStores(spark, refStore, curStore,
      nBins = 5, k = 256)
    val sums = got.agg(sum("n_ref"), sum("n_cur")).collect().head
    // bin masses are sketch fractions of the true total; rounding each
    // bin independently can drift by at most nBins/2 rows in the sum
    assert(math.abs(sums.getLong(0) - 21000L) <= 3,
      s"n_ref sum ${sums.getLong(0)} != true 21000")
    assert(math.abs(sums.getLong(1) - 15000L) <= 3,
      s"n_cur sum ${sums.getLong(1)} != true 15000")
  }

  test("keyed true-count rendering: per-key n sums track true per-key " +
      "ingested counts in the estimating regime") {
    val rng = new scala.util.Random(109)
    val refStore = tmpDir("truenk_ref_")
    val curStore = tmpDir("truenk_cur_")
    val mk = (n: Int, g: String, shift: Double) =>
      Seq.fill(n)((g, rng.nextGaussian() + shift)).toDF("g", "v")
    (0 until 2).foreach { e =>
      Profile.quantileSketchIncrementalBatchByKey(
        mk(6000, "a", 0).union(mk(4000, "b", 5)), "v", Seq("g"), refStore,
        k = 128, batchId = e.toLong)
      Profile.quantileSketchIncrementalBatchByKey(
        mk(3000, "a", 0.2).union(mk(2000, "b", 5.2)), "v", Seq("g"),
        curStore, k = 128, batchId = e.toLong)
    }
    val byKey = Profile.driftByKeyFromSketchStores(spark, refStore,
        curStore, Seq("g"), nBins = 4, k = 128)
      .groupBy("g").agg(sum("n_ref").as("nr"), sum("n_cur").as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(math.abs(byKey("a")._1 - 12000L) <= 2, s"a n_ref: $byKey")
    assert(math.abs(byKey("a")._2 - 6000L) <= 2, s"a n_cur: $byKey")
    assert(math.abs(byKey("b")._1 - 8000L) <= 2, s"b n_ref: $byKey")
    assert(math.abs(byKey("b")._2 - 4000L) <= 2, s"b n_cur: $byKey")
  }

  test("pre-r10 store upgrade: a legacy items table without n_rows " +
      "accepts new epochs and views fall back to survivor weight for " +
      "the old ones") {
    val store = tmpDir("legacy_kll_")
    // simulate a pre-r10 writer: items without the n_rows column
    val legacy = Seq((0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0))
      .toDF("level", "value")
      .select(col("level"), col("value"), lit("0").as("batch_id"))
    new graft.store.SnapshotTable(spark, s"$store/items").overwrite(legacy)
    // legacy epoch: 4 level-0 items => survivor-weight fallback count 4
    Profile.quantileSketchIncrementalBatch(
      Seq(5.0, 6.0).toDF("v"), "v", store, k = 1024, batchId = 1L)
    val med = Profile.quantileSketchView(spark, store, Seq(0.5), k = 1024)
      .collect().head.getDouble(1)
    assert(med == 3.0, s"median over 1..6 discrete = 3, got $med")
    val refStore = store
    val curStore = tmpDir("legacy_cur_")
    Profile.quantileSketchIncrementalBatch(
      (1 to 6).map(_.toDouble).toDF("v"), "v", curStore,
      k = 1024, batchId = 0L)
    val drift = Profile.driftFromSketchStores(spark, refStore, curStore,
      nBins = 3, k = 1024)
    val nr = drift.agg(sum("n_ref"), sum("n_cur")).collect().head
    assert(nr.getLong(0) == 6L, s"legacy weight fallback + new true: $nr")
    assert(nr.getLong(1) == 6L)
  }

  test("Misra-Gries fold: exact regime view identical across the fold; " +
      "store bounded; estimating-regime envelope stays valid") {
    val folded = tmpDir("fold_mg_")
    val plain = tmpDir("nofold_mg_")
    (0 until 12).foreach { e =>
      val items = (1 to 300).map(i => s"item_${i % 20}")
      Profile.heavyHittersIncrementalBatch(items.toDF("x"), "x", folded,
        capacity = 64, batchId = e.toLong, maxEpochs = 4)
      Profile.heavyHittersIncrementalBatch(items.toDF("x"), "x", plain,
        capacity = 64, batchId = e.toLong, maxEpochs = 0)
    }
    assertSameRows(
      Profile.heavyHittersView(spark, folded, k = 10),
      Profile.heavyHittersView(spark, plain, k = 10))
    assert(epochsIn(folded, "counters").size <= 5)
    assert(epochsIn(plain, "counters").size == 12)
    // estimating regime: capacity 8 << 50 distinct items; the true count
    // of the planted heavy item must stay inside [count_min, count_max]
    val tight = tmpDir("fold_mg_tight_")
    (0 until 10).foreach { e =>
      val items = Seq.fill(500)("hot") ++ (1 to 200).map(i => s"cold_$i")
      Profile.heavyHittersIncrementalBatch(items.toDF("x"), "x", tight,
        capacity = 8, batchId = e.toLong, maxEpochs = 4)
    }
    val hot = Profile.heavyHittersView(spark, tight, k = 3)
      .where(col("item") === "hot").collect().head
    val (lo, hi) = (hot.getLong(1), hot.getLong(2))
    assert(lo <= 5000L && 5000L <= hi,
      s"true 5000 outside folded envelope [$lo, $hi]")
  }

  test("keyed Misra-Gries store: per-key view == per-key counts in the " +
      "exact regime, across a fold and a replay; orphan meta err survives") {
    val folded = tmpDir("fold_mgk_")
    val plain = tmpDir("nofold_mgk_")
    val rows = (0 until 11).flatMap { e =>
      (1 to 200).map(i => (if (i % 2 == 0) "a" else "b",
        s"item_${(i + e) % 15}", e))
    }
    (0 until 11).foreach { e =>
      val b = rows.filter(_._3 == e).map(r => (r._1, r._2))
        .toDF("g", "x")
      Profile.heavyHittersIncrementalBatchByKey(b, "x", Seq("g"), folded,
        capacity = 64, batchId = e.toLong, maxEpochs = 4)
      Profile.heavyHittersIncrementalBatchByKey(b, "x", Seq("g"), plain,
        capacity = 64, batchId = e.toLong, maxEpochs = 0)
    }
    // replay a kept epoch on the folded store: must replace, not add
    val last = rows.filter(_._3 == 10).map(r => (r._1, r._2)).toDF("g", "x")
    Profile.heavyHittersIncrementalBatchByKey(last, "x", Seq("g"), folded,
      capacity = 64, batchId = 10L, maxEpochs = 4)
    assertSameRows(
      Profile.heavyHittersViewByKey(spark, folded, Seq("g"), k = 5),
      Profile.heavyHittersViewByKey(spark, plain, Seq("g"), k = 5))
    // exact regime: count_min == count_max == the true per-key count
    val got = Profile.heavyHittersViewByKey(spark, folded, Seq("g"), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong)
    got.foreach { case (k0, (lo, hi)) =>
      assert(lo == want(k0) && hi == want(k0), s"$k0: ($lo,$hi) vs ${want(k0)}")
    }
    assert(epochsIn(folded, "counters").size <= 5)
  }

  test("keyed HLL store: per-key view identical across the fold; keyed " +
      "replay drops for folded epochs") {
    val folded = tmpDir("fold_hllk_")
    val plain = tmpDir("nofold_hllk_")
    (0 until 11).foreach { e =>
      val b = (0 until 60).map(i =>
        (if (i % 3 == 0) "x" else "y", s"u${(e * 13 + i) % 37}"))
        .toDF("g", "u")
      Profile.distinctSketchIncrementalBatchByKey(b, "u", Seq("g"), folded,
        batchId = e.toLong, maxEpochs = 4)
      Profile.distinctSketchIncrementalBatchByKey(b, "u", Seq("g"), plain,
        batchId = e.toLong, maxEpochs = 0)
    }
    assertSameRows(
      Profile.distinctSketchViewByKey(spark, folded, Seq("g")),
      Profile.distinctSketchViewByKey(spark, plain, Seq("g")))
    val before = Profile.distinctSketchViewByKey(spark, folded, Seq("g"))
      .collect().toSeq
    Profile.distinctSketchIncrementalBatchByKey(
      Seq(("x", "brand_new")).toDF("g", "u"), "u", Seq("g"), folded,
      batchId = 0L, maxEpochs = 4) // folded epoch id: must drop
    assert(Profile.distinctSketchViewByKey(spark, folded, Seq("g"))
      .collect().toSeq == before)
    assert(epochsIn(folded, "sketches").size <= 5)
  }

  test("KS from sketch stores == the exact ECDF walk in the exact " +
      "regime; batch ksNumeric agrees; location shift registers") {
    val rng = new scala.util.Random(127)
    val refData = Seq.fill(3000)(math.floor(rng.nextDouble() * 400))
    val curData = Seq.fill(2500)(math.floor(rng.nextDouble() * 400 + 60))
    val refStore = tmpDir("ks_ref_"); val curStore = tmpDir("ks_cur_")
    val (r0, r1) = refData.splitAt(1500)
    Profile.quantileSketchIncrementalBatch(r0.toDF("v"), "v", refStore,
      k = 8192, batchId = 0L)
    Profile.quantileSketchIncrementalBatch(r1.toDF("v"), "v", refStore,
      k = 8192, batchId = 1L)
    Profile.quantileSketchIncrementalBatch(curData.toDF("v"), "v",
      curStore, k = 8192, batchId = 0L)
    val got = Profile.ksFromSketchStores(spark, refStore, curStore,
      k = 8192).collect().head
    // driver-side exact two-sample KS over the union of points
    val pts = (refData ++ curData).distinct.sorted
    val rs = refData.sorted.toArray; val cs = curData.sorted.toArray
    def cdf(a: Array[Double], x: Double): Double = {
      var i = java.util.Arrays.binarySearch(a, x)
      if (i < 0) i = -(i + 1) else { while (i < a.length && a(i) == x) i += 1 }
      i.toDouble / a.length
    }
    var best = 0.0; var at = Double.NaN
    pts.foreach { x =>
      val d = math.abs(cdf(rs, x) - cdf(cs, x))
      if (d > best) { best = d; at = x }
    }
    assert(got.getDouble(0) ==
      BigDecimal(best).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getDouble(1) == at)
    assert(got.getLong(2) == 3000L && got.getLong(3) == 2500L)
    assert(got.getDouble(0) > 0.1, "constructed shift must register")
    val batch = Profile.ksNumeric(refData.toDF("v"), curData.toDF("v"),
      "v", k = 8192).collect().head
    assert(batch == got)
  }

  test("reservoir store: sample-so-far == one-shot top-k across folds " +
      "and a replay; weighted priorities follow weightedSample") {
    import org.apache.spark.sql.functions.{conv, pow}
    val folded = tmpDir("fold_res_")
    val rows = (1L to 1100L).map(i => (i, s"lang_${i % 5}", (i % 7) + 1.0))
    (0 until 11).foreach { e =>
      val b = rows.filter(_._1 % 11 == e).toDF("doc_id", "lang", "w")
      Profile.sampleReservoirIncrementalBatch(b, "doc_id", Seq("lang"),
        folded, k = 30, batchId = e.toLong, maxEpochs = 4)
    }
    // replay a folded epoch with poisoned data: must drop entirely
    Profile.sampleReservoirIncrementalBatch(
      Seq((999999L, "poison", 1.0)).toDF("doc_id", "lang", "w"),
      "doc_id", Seq("lang"), folded, k = 30, batchId = 0L, maxEpochs = 4)
    val got = Profile.sampleReservoirView(spark, folded, k = 30)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    // one-shot reference: top-30 by the same deterministic priority
    val want = rows.toDF("doc_id", "lang", "w")
      .withColumn("__u",
        (conv(graft.operators.Sampling.sampleKey(col("doc_id")), 16, 10)
          .cast("long") + lit(1L)).cast("double") / lit(4294967296.0))
      .orderBy(col("__u").desc, col("doc_id")).limit(30)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want)
    assert(epochsIn(folded, "rows").size <= 5)
    // weighted: store sample == weightedSample winners on the same frame
    val wStore = tmpDir("fold_resw_")
    val all = rows.toDF("doc_id", "lang", "w")
    Profile.sampleReservoirIncrementalBatch(all, "doc_id", Seq("lang"),
      wStore, k = 25, batchId = 0L, weightCol = Some("w"))
    val gotW = Profile.sampleReservoirView(spark, wStore, k = 25)
      .select("id").collect().map(_.getLong(0)).toSet
    val wantW = graft.operators.Sampling.weightedSample(all, "doc_id",
      "w", k = 25).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotW == wantW)
  }

  test("drift timeline: per-epoch PSI flags exactly the drifted epoch; " +
      "folded epochs report as one consolidated row; storeStats describes") {
    val rng = new scala.util.Random(131)
    val refStore = tmpDir("dte_ref_"); val curStore = tmpDir("dte_cur_")
    val base = Seq.fill(2000)(math.floor(rng.nextDouble() * 100))
    Profile.quantileSketchIncrementalBatch(base.toDF("v"), "v", refStore,
      k = 8192, batchId = 0L)
    // 10 epochs from the reference distribution, epoch 7 shifted hard
    (0 until 10).foreach { e =>
      val vals =
        if (e == 7) Seq.fill(400)(math.floor(rng.nextDouble() * 100 + 70))
        else Seq.fill(400)(math.floor(rng.nextDouble() * 100))
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v", curStore,
        k = 8192, batchId = e.toLong, maxEpochs = 0)
    }
    val psi = Profile.driftEpochsFromSketchStores(spark, refStore,
        curStore, nBins = 5, k = 8192)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psi.size == 10)
    assert(psi("7") > 0.25, s"shifted epoch must alert: ${psi("7")}")
    (0 until 10).filter(_ != 7).foreach(e =>
      assert(psi(e.toString) < 0.1, s"quiet epoch $e alerted: ${psi(e.toString)}"))
    // same data through a FOLDING store: recent epochs keep their own
    // rows, aged ones merge under the sentinel (attribution traded away
    // by design — but the consolidated row still carries their mass)
    val foldedCur = tmpDir("dte_curf_")
    (0 until 10).foreach { e =>
      val vals =
        if (e == 7) Seq.fill(400)(math.floor(rng.nextDouble() * 100 + 70))
        else Seq.fill(400)(math.floor(rng.nextDouble() * 100))
      Profile.quantileSketchIncrementalBatch(vals.toDF("v"), "v",
        foldedCur, k = 8192, batchId = e.toLong, maxEpochs = 4)
    }
    val tl = Profile.driftEpochsFromSketchStores(spark, refStore,
        foldedCur, nBins = 5, k = 8192)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2))).toMap
    assert(tl.contains(Profile.FoldedEpochId))
    assert(tl(Profile.FoldedEpochId)._2 == tl.filterKeys(_ !=
      Profile.FoldedEpochId).values.map(_ => 0L).sum + // folded count:
      (10 - (tl.size - 1)) * 400L, // epochs not individually present
      s"consolidated n_cur: $tl")
    val stats = Profile.sketchStoreStats(spark, foldedCur).collect().head
    assert(stats.getLong(0) == (tl.size - 1).toLong, s"n_epochs: $stats")
    assert(stats.getBoolean(1), "has_folded")
    assert(stats.getLong(3) >= 0L, "watermark recorded")
    val statsPlain = Profile.sketchStoreStats(spark, curStore)
      .collect().head
    assert(statsPlain.getLong(0) == 10L && !statsPlain.getBoolean(1))
    assert(statsPlain.getLong(3) == -1L)
  }

  test("HLL fold: distinct-union view bit-identical across the fold; " +
      "replay of a folded epoch dropped") {
    val folded = tmpDir("fold_hll_")
    val plain = tmpDir("nofold_hll_")
    (0 until 12).foreach { e =>
      val items = (e * 50 until e * 50 + 80).map(i => s"u$i")
      Profile.distinctSketchIncrementalBatch(items.toDF("x"), "x", folded,
        batchId = e.toLong, maxEpochs = 4)
      Profile.distinctSketchIncrementalBatch(items.toDF("x"), "x", plain,
        batchId = e.toLong, maxEpochs = 0)
    }
    assertSameRows(
      Profile.distinctSketchView(spark, folded),
      Profile.distinctSketchView(spark, plain))
    assert(epochsIn(folded, "sketches").size <= 5)
    val before = Profile.distinctSketchView(spark, folded).collect().head
    Profile.distinctSketchIncrementalBatch(
      Seq("brand_new_item").toDF("x"), "x", folded,
      batchId = 0L, maxEpochs = 4) // folded epoch id: must drop
    val after = Profile.distinctSketchView(spark, folded).collect().head
    assert(after == before)
  }

  test("validate ledger fold: 14 epochs at maxEpochs=4 — view equals " +
      "the unfolded store and the one-shot check; replay across the " +
      "fold boundary drops; timeline excludes the sentinel") {
    import graft.operators.Validate
    val rng = new scala.util.Random(77)
    val folded = tmpDir("fold_val_")
    val plain = tmpDir("nofold_val_")
    val rules = Seq(
      Validate.notNull("v"),
      Validate.inRange("v", 0, 400))
    val all = scala.collection.mutable.ArrayBuffer[Option[Double]]()
    (0 until 14).foreach { e =>
      val vals: Seq[Option[Double]] = Seq.fill(50)(
        if (rng.nextDouble() < 0.1) None
        else Some(math.floor(rng.nextDouble() * 500)))
      all ++= vals
      Validate.checkIncrementalBatch(vals.toDF("v"), rules, folded,
        batchId = e.toLong, maxEpochs = 4)
      Validate.checkIncrementalBatch(vals.toDF("v"), rules, plain,
        batchId = e.toLong, maxEpochs = 0)
    }
    val got = Validate.checkView(spark, folded)
    assertSameRows(got, Validate.checkView(spark, plain))
    assertSameRows(got, Validate.check(all.toSeq.toDF("v"), rules))
    // bounded store: <= maxEpochs real epochs + the sentinel
    assert(epochsIn(folded).length <= 5 && epochsIn(plain).length == 14)
    // replay of an already-folded epoch must drop (watermark)
    val before = got.collect().toSet
    Validate.checkIncrementalBatch(
      Seq(Some(9999.0)).toDF("v"), rules, folded,
      batchId = 0L, maxEpochs = 4)
    assert(Validate.checkView(spark, folded).collect().toSet == before)
    // replay of a LIVE epoch replaces, never double-counts
    val liveEpoch = epochsIn(plain).map(_.toLong).max
    Validate.checkIncrementalBatch(
      Seq(Some(1.0)).toDF("v"), rules, plain,
      batchId = liveEpoch, maxEpochs = 0)
    val replayed = Validate.checkView(spark, plain).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(replayed.values.forall(_ == 13 * 50 + 1),
      s"live replay must replace: $replayed")
    // timeline: real epochs only, per-epoch fractions
    val tl = Validate.checkTimeline(spark, folded)
    val tlEpochs = tl.select("batch_id").distinct().count()
    assert(tlEpochs <= 4 && tl.where(col("batch_id").isNull).count() == 0)
    assert(tl.columns.contains("violation_frac"))
  }
}
