package graft

import org.apache.spark.sql.functions._

import graft.operators.ModelEval

/** Model-evaluation metrics: rank-sum AUC with ties, confusion stats,
  * calibration/ECE, Cohen's kappa — every number hand-computed. */
class ModelEvalSpec extends GraftSuite {
  import spark.implicits._

  test("aucRoc: tie-averaged rank-sum equals the pairwise definition, " +
      "nulls excluded, degenerate label sets yield null") {
    val df = Seq(
      (0.9, 1), (0.8, 1), (0.5, 1), // positives
      (0.5, 0), (0.3, 0)            // negatives, one tied at 0.5
    ).toDF("score", "label")
    val r = ModelEval.aucRoc(df, "score", "label").head()
    // pairwise: 5 clear wins + half credit for the 0.5-0.5 tie over
    // 3*2 pairs = 5.5/6
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(r.getDouble(2) == BigDecimal(5.5 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a null score or label drops the row, not the metric
    val withNulls = Seq(
      (Some(0.9), Some(1)), (Some(0.8), Some(1)), (Some(0.5), Some(1)),
      (Some(0.5), Some(0)), (Some(0.3), Some(0)),
      (None, Some(1)), (Some(0.99), None)
    ).toDF("score", "label")
    assert(ModelEval.aucRoc(withNulls, "score", "label").head() == r)
    // all-positive input: n_neg = 0, auc null (not 0/0)
    val onlyPos = ModelEval.aucRoc(
      df.where(col("label") === 1), "score", "label").head()
    assert(onlyPos.getLong(1) == 0L && onlyPos.isNullAt(2))
    // perfect separation reads exactly 1
    val sep = Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("score", "label")
    assert(ModelEval.aucRoc(sep, "score", "label").head().getDouble(2)
      == 1.0)
  }

  test("confusionStats: exact counts at an inclusive threshold; " +
      "no-predicted-positive degenerates to null precision") {
    val df = Seq(
      (0.9, 1), (0.5, 1), (0.4, 1), // tp, tp (>= is inclusive), fn
      (0.6, 0), (0.2, 0), (0.1, 0)  // fp, tn, tn
    ).toDF("score", "label")
    val r = ModelEval.confusionStats(df, "score", "label", 0.5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 2L, 1L)))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == r6(4.0 / 6.0)) // accuracy
    assert(r.getDouble(5) == r6(2.0 / 3.0)) // precision
    assert(r.getDouble(6) == r6(2.0 / 3.0)) // recall
    assert(r.getDouble(7) == r6(4.0 / 6.0)) // f1
    // nothing predicted positive: precision null, recall 0
    val low = ModelEval.confusionStats(df, "score", "label", 2.0).head()
    assert(low.getLong(0) == 0L && low.getLong(1) == 0L)
    assert(low.isNullAt(5) && low.getDouble(6) == 0.0)
  }

  test("calibration + ECE: bin folding, top-bin inclusion of 1.0, " +
      "hand-computed ece") {
    val df = Seq(
      (0.05, 0), (0.15, 0), (0.95, 1), (1.0, 1)
    ).toDF("score", "label")
    val cal = ModelEval.calibration(df, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    assert(cal.map(_.getInt(0)).toSeq == Seq(0, 1, 9))
    val top = cal.last
    // score 1.0 folds into bin 9 alongside 0.95
    assert(top.getLong(1) == 2L && top.getDouble(2) == 0.975
      && top.getDouble(3) == 1.0)
    val ece = ModelEval.expectedCalibrationError(
      df, "score", "label", nBins = 10).head()
    // bins: (1, .05, 0) (1, .15, 0) (2, .975, 1): ece =
    // (1*.05 + 1*.15 + 2*.025)/4 = 0.0625
    assert(ece.getLong(0) == 4L && ece.getDouble(1) == 0.0625)
  }

  test("aucRocByKey: per-slice rank-sum matches per-slice aucRoc; " +
      "null keys form their own slice") {
    val df = Seq(
      (Some("a"), 0.9, 1), (Some("a"), 0.8, 1), (Some("a"), 0.2, 0),
      (Some("b"), 0.9, 1), (Some("b"), 0.8, 1), (Some("b"), 0.5, 1),
      (Some("b"), 0.5, 0), (Some("b"), 0.3, 0),
      (None: Option[String], 0.1, 1), (None: Option[String], 0.9, 0)
    ).toDF("k", "score", "label")
    val got = ModelEval.aucRocByKey(df, "score", "label", Seq("k"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(Some("a")) == ((2L, 1L, 1.0)))       // perfect separation
    assert(got(Some("b")) == ((3L, 2L, r6(5.5 / 6)))) // the tied fixture
    assert(got(None) == ((1L, 1L, 0.0)))            // inverted slice
    // each slice must equal the global metric computed on that slice
    Seq("a", "b").foreach { k =>
      val solo = ModelEval.aucRoc(
        df.where(col("k") === k), "score", "label").head()
      assert((solo.getLong(0), solo.getLong(1), solo.getDouble(2))
        == got(Some(k)))
    }
  }

  test("prCurve + averagePrecision: hand-walked thresholds, step-rule " +
      "area, degenerate empty input") {
    val df = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.3, 0))
      .toDF("score", "label")
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val curve = ModelEval.prCurve(df, "score", "label")
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(curve.toSeq == Seq(
      (0.9, 1L, 0L, 1.0, 0.5),
      (0.5, 2L, 1L, r6(2.0 / 3), 1.0),
      (0.3, 2L, 2L, 0.5, 1.0)))
    val ap = ModelEval.averagePrecision(df, "score", "label").head()
    // steps: +1 pos at P=1, +1 pos at P=2/3, +0 -> (1 + 2/3)/2
    assert((ap.getLong(0), ap.getLong(1)) == ((2L, 2L)))
    assert(ap.getDouble(2) == r6((1.0 + 2.0 / 3) / 2))
    // empty input: zero counts, null ap (nothing to average)
    val empty = ModelEval.averagePrecision(
      df.where(col("score") < 0), "score", "label").head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L
      && empty.isNullAt(2))
  }

  test("rankingMetrics: recall/MRR/nDCG hand-computed; truth-only and " +
      "results-only queries surface correctly; k cuts") {
    val results = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (1L, 40L, 4),
      (3L, 90L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq(
      (1L, 20L), (1L, 99L), (1L, 40L), // 40 hits only past k=3
      (2L, 50L)                        // never retrieved
    ).toDF("query_id", "doc_id")
    val got = ModelEval.rankingMetrics(results, truth,
      "query_id", "doc_id", "rank", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: 3 relevant, one hit at rank 2 (rank-4 hit cut by k=3);
    // IDCG@3 arranges all min(3, k=3) relevant at ranks 1..3
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    val dcg = 1.0 / log2(3.0)
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(got(1L)._1 == 3L && got(1L)._2 == 1L)
    assert(got(1L)._3 == Some(r6(1.0 / 3)))
    assert(got(1L)._4 == Some(0.5))
    assert(got(1L)._5 == Some(r6(dcg / idcg)))
    // q2: relevant but never retrieved -> zeros
    assert(got(2L) == ((1L, 0L, Some(0.0), Some(0.0), Some(0.0))))
    // q3: retrieved but no truth -> nothing to grade against
    assert(got(3L) == ((0L, 0L, None, None, None)))
  }

  test("cohenKappa: textbook 2x2 fixture, null-row exclusion, " +
      "constant-agreement undefined") {
    val df = Seq(
      ("y", "y"), ("y", "n"), ("n", "n"), ("n", "n")
    ).toDF("a", "b")
    val r = ModelEval.cohenKappa(df, "a", "b").head()
    // po = 3/4; marginals a:{y:2,n:2} b:{y:1,n:3};
    // pe = (2*1 + 2*3)/16 = 0.5; kappa = (0.75-0.5)/(1-0.5) = 0.5
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.75
      && r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    // null on either side drops the row
    val withNull = df.union(Seq((null, "y"), ("y", null)).toDF("a", "b"))
    assert(ModelEval.cohenKappa(withNull, "a", "b").head() == r)
    // both raters constant and equal: pe = 1, kappa undefined -> null
    val const = Seq(("y", "y"), ("y", "y")).toDF("a", "b")
    val c = ModelEval.cohenKappa(const, "a", "b").head()
    assert(c.getDouble(1) == 1.0 && c.getDouble(2) == 1.0 && c.isNullAt(3))
  }

  test("fleissKappa: Wikipedia-style hand fixture, perfect agreement, " +
      "chance-only null, unequal rating counts refused") {
    import spark.implicits._
    // 4 items x 3 raters, 2 categories; contingency per item:
    // i1: (3,0)  i2: (2,1)  i3: (1,2)  i4: (0,3)
    val ratings = Seq(
      (1, "a"), (1, "a"), (1, "a"),
      (2, "a"), (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "b"),
      (4, "b"), (4, "b"), (4, "b")).toDF("item", "cat")
    val got = ModelEval.fleissKappa(ratings, "item", "cat").head()
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // P_i = (sum n_ij^2 - n) / (n(n-1)): (9-3)/6=1, (5-3)/6=1/3 twice, 1
    val po = (1.0 + 1.0 / 3 + 1.0 / 3 + 1.0) / 4
    // p_a = 6/12, p_b = 6/12 -> pe = 0.5
    val pe = 0.5
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L)
    assert(got.getDouble(2) == r6(po) && got.getDouble(3) == pe)
    assert(got.getDouble(4) == r6((r6(po) - pe) / (1 - pe)))

    // perfect agreement
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"))
      .toDF("item", "cat")
    assert(ModelEval.fleissKappa(perfect, "item", "cat")
      .head().getDouble(4) == 1.0)
    // every rating its own category on every item -> pe path sane,
    // po = 0 -> kappa < 0 (worse than chance)
    val anti = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"))
      .toDF("item", "cat")
    assert(ModelEval.fleissKappa(anti, "item", "cat")
      .head().getDouble(4) < 0)
    // unequal ratings per item refused in-plan
    intercept[Exception] {
      ModelEval.fleissKappa(
        Seq((1, "x"), (1, "y"), (2, "x")).toDF("item", "cat"),
        "item", "cat").collect()
    }
  }

  test("bootstrapMeanCI: driver replay of the Poisson weights and " +
      "replicate means; CI brackets; deterministic; guards") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, 10.0 + (i % 21).toDouble))
    val df = rows.toDF("id", "v")
    val got = ModelEval.bootstrapMeanCI(df, "v", "id", b = 50, seed = 7)
      .head()

    // full driver replay: same md5 -> uniform -> Poisson inverse walk
    val cum = Seq(0.3678794411714423, 0.7357588823428846,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253,
      0.9999988747974512)
    def weight(id: Long, b: Int): Double = {
      // replicate b reads 8-hex slot (b-1)%4 of digest chunk (b-1)/4
      val chunk = (b - 1) / 4
      val slot = (b - 1) % 4
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7#$id#$chunk".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
        .substring(8 * slot, 8 * slot + 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1L).toDouble / 4294967297.0
      val k = cum.indexWhere(u <= _)
      if (k < 0) 9.0 else k.toDouble
    }
    val means = (1 to 50).flatMap { b =>
      var sw = 0.0; var swx = 0.0
      rows.foreach { case (id, x) =>
        val w = weight(id, b); sw += w; swx += w * x
      }
      if (sw == 0) None else Some(swx / sw)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // interpolated percentile (Spark/DuckDB quantile_cont semantics)
    def pct(sorted: Seq[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val sortedM = means.sorted
    val est = rows.map(_._2).sum / rows.length
    val mbar = means.sum / means.length
    val se = math.sqrt(
      means.map(m => (m - mbar) * (m - mbar)).sum / (means.length - 1))
    assert(got.getLong(0) == 400L && got.getLong(1) == 50L)
    assert(math.abs(got.getDouble(2) - r6(est)) < 1e-9)
    assert(math.abs(got.getDouble(3) - se) < 1e-6, s"se ${got.getDouble(3)} vs $se")
    assert(math.abs(got.getDouble(4) - pct(sortedM, 0.025)) < 1e-6)
    assert(math.abs(got.getDouble(5) - pct(sortedM, 0.975)) < 1e-6)
    // sane bracket around the true mean, and nonzero width
    assert(got.getDouble(4) < est && est < got.getDouble(5))
    assert(got.getDouble(5) - got.getDouble(4) > 0)

    // partitioning must not change a digit
    val re = ModelEval.bootstrapMeanCI(df.repartition(13), "v", "id",
      b = 50, seed = 7).head()
    assert(re == got)
    // nulls ignored
    val withNull = df.union(Seq((999L, null.asInstanceOf[java.lang.Double]))
      .map { case (i, v) => (i, v: java.lang.Double) }
      .toDF("id", "v"))
    assert(ModelEval.bootstrapMeanCI(withNull, "v", "id", b = 50, seed = 7)
      .head() == got)

    intercept[IllegalArgumentException] {
      ModelEval.bootstrapMeanCI(df, "v", "id", b = 1)
    }
    intercept[IllegalArgumentException] {
      ModelEval.bootstrapMeanCI(df, "v", "id", alpha = 0.0)
    }
  }

  test("bootstrapMeanCIByKey: each slice equals the global bootstrap " +
      "run on that slice alone (weights are key-independent)") {
    import spark.implicits._
    val df = (1L to 300L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", (i % 17).toDouble))
      .toDF("id", "k", "v")
    val keyed = ModelEval.bootstrapMeanCIByKey(df, "v", "id", Seq("k"),
        b = 40, seed = 5)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    Seq("a", "b").foreach { k =>
      val solo = ModelEval.bootstrapMeanCI(df.where(col("k") === k),
        "v", "id", b = 40, seed = 5).head().toSeq
      assert(keyed(k) == solo, s"slice $k diverged")
    }
    intercept[IllegalArgumentException] {
      ModelEval.bootstrapMeanCIByKey(df, "v", "id", Seq.empty)
    }
  }
}
