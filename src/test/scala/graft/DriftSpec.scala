package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** PSI drift detection: hand-computed terms, zero drift on identical
  * inputs, null-rate drift bin, bin bounds, the sketch cut path, the
  * categorical variant, and the robustStats train-side frame. */
class DriftSpec extends GraftSuite {
  import spark.implicits._

  private def psiTerm(pc: Double, pr: Double, eps: Double = 1e-6): Double = {
    val (a, b) = (math.max(pc, eps), math.max(pr, eps))
    BigDecimal((a - b) * math.log(a / b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("identical distributions drift by exactly zero in every bin") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val got = Profile.driftNumeric(df, df, "v", nBins = 10).collect()
    assert(got.length == 10)
    assert(got.forall(r => r.getDouble(r.fieldIndex("psi_term")) == 0.0))
    assert(got.forall(r =>
      r.getLong(r.fieldIndex("n_ref")) == r.getLong(r.fieldIndex("n_cur"))))
  }

  test("hand-computed 2-bin shift: emptied bin clamps to eps") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v") // median cut 2.5
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("v") // everything above the cut
    val got = Profile.driftNumeric(ref, cur, "v", nBins = 2)
      .orderBy("bin").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1))
    val bin0 = got(0); val bin1 = got(1)
    assert(bin0.getLong(bin0.fieldIndex("n_ref")) == 2 &&
      bin0.getLong(bin0.fieldIndex("n_cur")) == 0)
    assert(bin0.getDouble(bin0.fieldIndex("psi_term")) == psiTerm(0.0, 0.5))
    assert(bin1.getDouble(bin1.fieldIndex("psi_term")) == psiTerm(1.0, 0.5))
    // bounds: bin 0 is open below, closes at the cut; last bin open above
    assert(bin0.isNullAt(bin0.fieldIndex("lo")) &&
      bin0.getDouble(bin0.fieldIndex("hi")) == 2.5)
    assert(bin1.getDouble(bin1.fieldIndex("lo")) == 2.5 &&
      bin1.isNullAt(bin1.fieldIndex("hi")))
  }

  test("null values land in bin -1 on both sides: null-rate drift is drift") {
    val ref = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
      .toDF("v")
    val cur = Seq(Some(1.0), None, None, None, None).toDF("v")
    val got = Profile.driftNumeric(ref, cur, "v", nBins = 2)
      .where(col("bin") === -1).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("n_ref")) == 1 &&
      r.getLong(r.fieldIndex("n_cur")) == 4)
    assert(r.isNullAt(r.fieldIndex("lo")) && r.isNullAt(r.fieldIndex("hi")))
    assert(r.getDouble(r.fieldIndex("psi_term")) == psiTerm(0.8, 0.2))
  }

  test("an all-null reference fails loudly - on BOTH cut paths (the " +
      "sketch renders empty as NaN, which must not bin silently)") {
    val ref = Seq[Option[Double]](None, None).toDF("v")
    val cur = Seq(1.0).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Profile.driftNumeric(ref, cur, "v")
    }
    assert(e.getMessage.contains("no non-null values"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.driftNumeric(ref, cur, "v", approx = true)
    }
    assert(e2.getMessage.contains("no non-null values"))
  }

  test("sketch cuts (approx = true) agree with exact on separated data") {
    val rng = new scala.util.Random(41)
    val ref = Seq.fill(400)(rng.nextDouble()).toDF("v")
    val cur = Seq.fill(400)(rng.nextDouble() + 0.3).toDF("v")
    val exact = Profile.driftNumeric(ref, cur, "v", nBins = 4)
      .agg(sum("psi_term")).collect().head.getDouble(0)
    val approx = Profile.driftNumeric(ref, cur, "v", nBins = 4,
        approx = true, k = 2048)
      .agg(sum("psi_term")).collect().head.getDouble(0)
    assert(exact > 0.25, s"constructed shift must alert, psi=$exact")
    assert(math.abs(exact - approx) < 0.1 * exact,
      s"sketch psi $approx strays from exact $exact")
  }

  test("categorical drift: vanished and new categories clamp, nulls are " +
      "a category") {
    val ref = Seq("a", "a", "b", "b").toDF("c")
    val cur = Seq(Some("b"), Some("b"), Some("c"), None).toDF("c")
    val got = Profile.driftCategorical(ref, cur, "c").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"),
        r.getLong(1), r.getLong(2), r.getDouble(5))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("<null>", "a", "b", "c"))
    val byCat = got.map(t => t._1 -> t).toMap
    assert(byCat("a")._4 == psiTerm(0.0, 0.5))   // vanished
    assert(byCat("b")._4 == psiTerm(0.5, 0.5))   // steady = 0
    assert(byCat("c")._4 == psiTerm(0.25, 0.0))  // appeared
    assert(byCat("<null>")._4 == psiTerm(0.25, 0.0))
  }

  test("robustStats emits one row per key with interpolated median and MAD") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 100.0),
      ("h", 5.0), ("i", Double.NaN)).toDF("k", "v")
      .where(!isnan(col("v")))
    val got = Profile.robustStats(df, "v", Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("g")._1 == 2.5) // percentile interpolates between 2 and 3
    // residuals to 2.5: {1.5, 0.5, 0.5, 97.5} -> median 1.0
    assert(got("g")._2 == 1.0)
    assert(got("h") == ((5.0, 0.0)))
    assert(!got.contains("i"))
  }

  test("keyed drift: per-key cuts, a shift confined to one key alerts " +
      "only there; unmonitored and null keys are excluded") {
    val rng = new scala.util.Random(67)
    // key "a" lives near 0, key "b" near 100 — per-key cuts MUST differ
    val refRows = Seq.fill(500)(("a", rng.nextDouble())) ++
      Seq.fill(500)(("b", 100 + rng.nextDouble()))
    val curRows = Seq.fill(500)(("a", rng.nextDouble())) ++        // stable
      Seq.fill(500)(("b", 100.6 + rng.nextDouble())) ++            // shifted
      Seq.fill(10)(("newkey", 5.0)) ++                             // no baseline
      Seq.fill(10)((null.asInstanceOf[String], 1.0))               // no identity
    val got = Profile.driftNumericByKey(refRows.toDF("k", "v"),
      curRows.toDF("k", "v"), "v", Seq("k"), nBins = 4)
    val psiByKey = got.groupBy("k").agg(sum("psi_term").as("psi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psiByKey.keySet == Set("a", "b"),
      s"only baselined non-null keys monitored, got ${psiByKey.keySet}")
    assert(psiByKey("a") < 0.05, s"stable key must not alert: ${psiByKey("a")}")
    assert(psiByKey("b") > 0.25, s"shifted key must alert: ${psiByKey("b")}")
    // cuts are per-key: key b's bin bounds live near 100
    val bCut = got.where(col("k") === "b" && col("bin") === 1)
      .select("lo").collect().head.getDouble(0)
    assert(bCut > 99, s"key b's cuts must come from key b's values: $bCut")
    // and the keyed frame agrees with running driftNumeric per key
    val aOnly = Profile.driftNumeric(
      refRows.filter(_._1 == "a").toDF("k", "v").select("v"),
      curRows.filter(_._1 == "a").toDF("k", "v").select("v"),
      "v", nBins = 4)
    val aKeyed = got.where(col("k") === "a")
      .select("bin", "lo", "hi", "n_ref", "n_cur", "p_ref", "p_cur",
        "psi_term")
    assertSameRows(aKeyed, aOnly)
  }

  test("sketch-native drift == driftNumeric(approx) in the exact regime, " +
      "across epochs and a replayed delivery") {
    val rng = new scala.util.Random(59)
    val refData = Seq.fill(900)(rng.nextDouble() * 100).map(math.floor)
    val curData = Seq.fill(700)(rng.nextDouble() * 100 + 15).map(math.floor)
    val refDf = refData.toDF("v"); val curDf = curData.toDF("v")
    val refStore = tmpDir("drift_ref_"); val curStore = tmpDir("drift_cur_")
    val (r0, r1) = refData.splitAt(450)
    Profile.quantileSketchIncrementalBatch(r0.toDF("v"), "v", refStore,
      k = 4096, batchId = 0L)
    Profile.quantileSketchIncrementalBatch(r1.toDF("v"), "v", refStore,
      k = 4096, batchId = 1L)
    val (c0, c1) = curData.splitAt(350)
    Profile.quantileSketchIncrementalBatch(c0.toDF("v"), "v", curStore,
      k = 4096, batchId = 0L)
    Profile.quantileSketchIncrementalBatch(c1.toDF("v"), "v", curStore,
      k = 4096, batchId = 1L)
    Profile.quantileSketchIncrementalBatch(c1.toDF("v"), "v", curStore,
      k = 4096, batchId = 1L) // replay must not double-count
    val fromStores = Profile.driftFromSketchStores(spark, refStore,
      curStore, nBins = 5, k = 4096)
    val fromData = Profile.driftNumeric(refDf, curDf, "v", nBins = 5,
      approx = true, k = 4096)
    assertSameRows(fromStores, fromData)
    val psi = fromStores.agg(sum("psi_term")).collect().head.getDouble(0)
    assert(psi > 0.1, s"constructed shift must register, psi=$psi")
  }

  test("sketch drift: empty current store alerts with eps bins; empty " +
      "reference fails loudly") {
    val refStore = tmpDir("drift_ref_"); val curStore = tmpDir("drift_cur_")
    Profile.quantileSketchIncrementalBatch(
      (1 to 100).map(_.toDouble).toDF("v"), "v", refStore,
      k = 1024, batchId = 0L)
    val got = Profile.driftFromSketchStores(spark, refStore, curStore,
      nBins = 4, k = 1024).collect()
    assert(got.length == 4)
    assert(got.forall(r => r.getLong(r.fieldIndex("n_cur")) == 0L &&
      r.getDouble(r.fieldIndex("p_cur")) == 1e-6))
    assert(got.forall(r => r.getDouble(r.fieldIndex("psi_term")) > 1.0),
      "every reference bin vanishing is a loud alert")
    val e = intercept[IllegalArgumentException] {
      Profile.driftFromSketchStores(spark, curStore, refStore,
        nBins = 4, k = 1024)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("keyed sketch drift == driftNumericByKey(approx) in the exact " +
      "regime; keyed view renders per-key quantiles; replay exactly-once") {
    val rng = new scala.util.Random(73)
    val refRows = Seq.fill(400)(("a", math.floor(rng.nextDouble() * 40))) ++
      Seq.fill(400)(("b", math.floor(rng.nextDouble() * 40 + 200)))
    val curRows = Seq.fill(400)(("a", math.floor(rng.nextDouble() * 40))) ++
      Seq.fill(400)(("b", math.floor(rng.nextDouble() * 40 + 212)))
    val refStore = tmpDir("kdrift_ref_"); val curStore = tmpDir("kdrift_cur_")
    val (r0, r1) = refRows.splitAt(400)
    Profile.quantileSketchIncrementalBatchByKey(r0.toDF("g", "v"), "v",
      Seq("g"), refStore, k = 4096, batchId = 0L)
    Profile.quantileSketchIncrementalBatchByKey(r1.toDF("g", "v"), "v",
      Seq("g"), refStore, k = 4096, batchId = 1L)
    Profile.quantileSketchIncrementalBatchByKey(curRows.toDF("g", "v"),
      "v", Seq("g"), curStore, k = 4096, batchId = 0L)
    Profile.quantileSketchIncrementalBatchByKey(curRows.toDF("g", "v"),
      "v", Seq("g"), curStore, k = 4096, batchId = 0L) // replay
    val fromStores = Profile.driftByKeyFromSketchStores(spark, refStore,
      curStore, Seq("g"), nBins = 4, k = 4096)
    val fromData = Profile.driftNumericByKey(refRows.toDF("g", "v"),
      curRows.toDF("g", "v"), "v", Seq("g"), nBins = 4,
      approx = true, k = 4096)
    assertSameRows(fromStores, fromData)
    val psiByKey = fromStores.groupBy("g")
      .agg(sum("psi_term").as("psi")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psiByKey("a") < 0.05 && psiByKey("b") > 0.25,
      s"shift confined to b must alert only there: $psiByKey")
    // keyed view: per-key medians land in each key's own range
    val med = Profile.quantileSketchViewByKey(spark, refStore, Seq("g"),
      Seq(0.5), k = 4096).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(med("a") < 45 && med("b") > 195, s"per-key medians: $med")
  }

  test("sketch drift tracks exact drift within tolerance in the " +
      "estimating regime (50k rows, k = 512)") {
    val rng = new scala.util.Random(61)
    val refData = Seq.fill(50000)(rng.nextGaussian())
    val curData = Seq.fill(50000)(rng.nextGaussian() * 1.3 + 0.4)
    val refStore = tmpDir("drift_ref_"); val curStore = tmpDir("drift_cur_")
    Profile.quantileSketchIncrementalBatch(refData.toDF("v"), "v",
      refStore, k = 512, batchId = 0L)
    Profile.quantileSketchIncrementalBatch(curData.toDF("v"), "v",
      curStore, k = 512, batchId = 0L)
    val sketchPsi = Profile.driftFromSketchStores(spark, refStore,
        curStore, nBins = 10, k = 512)
      .agg(sum("psi_term")).collect().head.getDouble(0)
    val exactPsi = Profile.driftNumeric(refData.toDF("v"),
        curData.toDF("v"), "v", nBins = 10)
      .agg(sum("psi_term")).collect().head.getDouble(0)
    assert(exactPsi > 0.1, s"constructed shift must alert, psi=$exactPsi")
    assert(math.abs(sketchPsi - exactPsi) < 0.15 * exactPsi,
      s"sketch psi $sketchPsi strays from exact $exactPsi")
  }

  test("outliers still flags through the factored stats (regression)") {
    val df = Seq(8.0, 9.0, 10.0, 11.0, 12.0, 100.0).map(("g", _)).toDF("g", "v")
    val flagged = Profile.outliers(df, "v", Seq("g"), z = 3.5)
      .where(col("is_outlier")).select("v").collect().map(_.getDouble(0))
    assert(flagged.toSeq == Seq(100.0))
  }

  test("controlChart: driver replay of the EWMA and CUSUM recurrences; " +
      "constructed drift alarms; flat series never alarms; guards") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a series that sits at 10 for 20 points then drifts up by +0.8
    // sigma-ish steps — the textbook EWMA/CUSUM detection target
    val vals = (1 to 20).map(i => 10.0 + (if (i % 2 == 0) 0.5 else -0.5)) ++
      (21 to 30).map(i => 10.0 + 0.4 * (i - 20))
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", i + 1, v) }
    val df = rows.toDF("metric", "epoch", "v")
    val got = Profile.controlChart(df, "v", "epoch", Seq("metric"),
        alpha = 0.2, ewmaL = 3.0, cusumSlack = 0.5, cusumH = 5.0)
      .orderBy("epoch").collect()
    assert(got.length == vals.length)

    // driver replay of the exact recurrences
    val n = vals.length
    val mu = vals.sum / n
    val sigma = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / n)
    var zEwma = mu
    var cHi = 0.0
    var cLo = 0.0
    vals.zipWithIndex.foreach { case (v, idx) =>
      val i = idx + 1
      zEwma = 0.2 * v + 0.8 * zEwma
      val zScore = (v - mu) / sigma
      cHi = math.max(0.0, cHi + zScore - 0.5)
      cLo = math.max(0.0, cLo - zScore - 0.5)
      val sigZ = sigma * math.sqrt(0.2 / 1.8 *
        (1.0 - math.pow(0.64, i.toDouble)))
      val r = got(idx)
      assert(math.abs(r.getDouble(r.fieldIndex("ewma")) - zEwma) < 1e-6,
        s"ewma at $i")
      assert(math.abs(r.getDouble(r.fieldIndex("cusum_hi")) - cHi) < 1e-6,
        s"cusum_hi at $i")
      assert(math.abs(r.getDouble(r.fieldIndex("cusum_lo")) - cLo) < 1e-6,
        s"cusum_lo at $i")
      assert(r.getDouble(r.fieldIndex("ewma_ucl")) ==
        r6(mu + 3.0 * sigZ), s"ucl at $i")
      assert(r.getBoolean(r.fieldIndex("ewma_alarm")) ==
        (math.abs(zEwma - mu) > 3.0 * sigZ), s"ewma_alarm at $i")
      assert(r.getBoolean(r.fieldIndex("cusum_alarm")) ==
        (cHi > 5.0 || cLo > 5.0), s"cusum_alarm at $i")
    }
    // the constructed drift must actually fire both detectors by the end
    val last = got.last
    assert(last.getBoolean(last.fieldIndex("ewma_alarm")))
    assert(last.getBoolean(last.fieldIndex("cusum_alarm")))
    // and the in-control prefix must be quiet
    assert(got.take(18).forall(r =>
      !r.getBoolean(r.fieldIndex("cusum_alarm"))))

    // a zero-sigma series never alarms (no spurious float-residue alarms)
    val flat = (1 to 10).map(i => ("f", i, 7.0)).toDF("metric", "epoch", "v")
    val flatGot = Profile.controlChart(flat, "v", "epoch", Seq("metric"))
      .collect()
    assert(flatGot.forall(r => !r.getBoolean(r.fieldIndex("ewma_alarm")) &&
      !r.getBoolean(r.fieldIndex("cusum_alarm"))))

    // alpha = 1 degenerates the EWMA to the raw series
    val raw = Profile.controlChart(df, "v", "epoch", Seq("metric"),
        alpha = 1.0).orderBy("epoch").collect()
    raw.zip(vals).foreach { case (r, v) =>
      assert(r.getDouble(r.fieldIndex("ewma")) == r6(v))
    }

    // keyed independence: a second flat key does not disturb the first
    val two = (rows ++ (1 to 30).map(i => ("q", i, 3.0))).toDF(
      "metric", "epoch", "v")
    val keyed = Profile.controlChart(two, "v", "epoch", Seq("metric"))
      .where(col("metric") === "m").orderBy("epoch").collect()
    keyed.zip(got).foreach { case (a, b) =>
      assert(a.getDouble(a.fieldIndex("ewma")) ==
        b.getDouble(b.fieldIndex("ewma")))
    }

    // guards: nulls and duplicate (key, order) points raise in-plan
    val withNull = Seq(("m", 1, Some(1.0)), ("m", 2, None))
      .toDF("metric", "epoch", "v")
    val e1 = intercept[Exception] {
      Profile.controlChart(withNull, "v", "epoch", Seq("metric")).collect()
    }
    assert(e1.getMessage != null)
    val withDup = Seq(("m", 1, 1.0), ("m", 1, 2.0))
      .toDF("metric", "epoch", "v")
    intercept[Exception] {
      Profile.controlChart(withDup, "v", "epoch", Seq("metric")).collect()
    }
    intercept[IllegalArgumentException] {
      Profile.controlChart(df, "v", "epoch", Seq("metric"), alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Profile.controlChart(df, "ewma", "epoch", Seq("metric"))
    }
    // maxPoints bound raises in-plan
    intercept[Exception] {
      Profile.controlChart(df, "v", "epoch", Seq("metric"), maxPoints = 5)
        .collect()
    }
  }
}
