package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for the filter/classifier models a training-data
  * pipeline trains and applies (quality filters, language ID, toxicity
  * gates): ROC AUC, threshold confusion stats, calibration + ECE,
  * inter-annotator agreement. Everything is exact relational arithmetic
  * — integer counts until the final division, rounded to 6 places — so
  * every metric is replicable 1:1 in ANSI SQL, which is how the oracle
  * checks them.
  *
  * Ref parity note: no reference equivalent; extends the validation
  * family ([[Validate]] gates data, this grades the models that gate
  * data) per the training-data-ops mandate.
  */
object ModelEval {

  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** In-plan distinct-score cardinality guard for the global rank
    * walks: the unpartitioned window's input is the per-distinct-score
    * frame, so its size is the score ALPHABET — bounded for quantized
    * scores but ≈ n for a raw continuous double, where the window
    * degenerates to one task sorting the corpus. The scaladoc alone
    * doesn't enforce the quantization, so this does: a distributed
    * count of `perScore` rides back as a broadcast one-row frame and
    * raises past [[GraftConf.modelEvalScoreLimit]] BEFORE any
    * single-partition gather (the bruteForceRowLimit discipline —
    * fail fast, name the fix). Exchange reuse keeps `perScore` from
    * being computed twice. Returns the frame with a `__guard` column
    * (always null on the pass path) the caller must reference in a
    * live output column so pruning can't drop the check. */
  private def guardScoreAlphabet(perScore: DataFrame, what: String): DataFrame = {
    val limit = graft.GraftConf.modelEvalScoreLimit(perScore.sparkSession)
    if (limit <= 0L) perScore.withColumn("__guard", lit(null).cast("string"))
    else {
      val n = perScore.agg(count(lit(1)).as("__nscores"))
      perScore.crossJoin(broadcast(n))
        .withColumn("__guard", when(col("__nscores") > limit,
          raise_error(lit(
            s"$what: more than $limit distinct score values - the rank " +
              "walk would sort them in one task; quantize the score " +
              "upstream (e.g. round(score, 6)) or raise " +
              "spark.graft.modelEvalScoreLimit")))
          .otherwise(lit(null).cast("string")))
        .drop("__nscores")
    }
  }

  /** ROC AUC by the Mann-Whitney rank-sum identity, ties handled by
    * average ranks (the exact trapezoidal AUC): one row `(n_pos, n_neg,
    * auc)`, `auc = (Σ_{pos} avgrank − nPos(nPos+1)/2) / (nPos·nNeg)`,
    * rounded to 6. Null scores/labels are excluded (a model that
    * abstained can't be graded on the row); degenerate inputs (no
    * positives or no negatives) yield a null auc rather than a lying
    * 0/0.
    *
    * Scale shape: rows collapse FIRST to per-distinct-score counts
    * (one map-side-combined aggregate), so the rank prefix-walk is a
    * window over DISTINCT scores, not rows — for a quality filter
    * emitting 6-decimal scores that is at most ~10^6 entries no matter
    * the corpus size (quantize wider scores upstream, e.g.
    * `round(score, 6)`, to bound it). The unpartitioned window is the
    * documented single-partition step; its input is the bounded
    * distinct-score table, never the corpus — and the bound is
    * ENFORCED in-plan: past `spark.graft.modelEvalScoreLimit`
    * (default 2M) distinct scores the plan raises naming
    * `round(score, 6)` instead of sorting the corpus in one task. */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .where(qcol(scoreCol).isNotNull && qcol(labelCol).isNotNull)
      .groupBy(qcol(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(qcol(labelCol).cast("int") === 1, 1L).otherwise(0L))
          .as("__np"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = guardScoreAlphabet(perScore, "aucRoc")
      .withColumn("__cum", sum(col("__n")).over(w) - col("__n"))
      // Σ over this score's positives of the tie-averaged rank;
      // __guard is always null (the over-limit path raises) — wrapping
      // the live __rs column keeps the guard from being pruned away
      .withColumn("__rs",
        when(col("__guard").isNull,
          col("__np") * (col("__cum").cast("double")
            + (col("__n").cast("double") + 1.0) / 2.0)))
    ranked.agg(
        sum(col("__np")).as("__P"),
        sum(col("__n") - col("__np")).as("__N"),
        sum(col("__rs")).as("__R"))
      .select(
        coalesce(col("__P"), lit(0L)).as("n_pos"),
        coalesce(col("__N"), lit(0L)).as("n_neg"),
        round(try_divide(col("__R") - col("__P").cast("double")
            * (col("__P").cast("double") + 1.0) / 2.0,
          col("__P").cast("double") * col("__N").cast("double")), 6)
          .as("auc"))
  }

  /** Per-slice [[aucRoc]]: one row per distinct `keys` combination —
    * the fairness audit ("does the quality filter rank well for EVERY
    * language/source, not just in aggregate?"). Same per-distinct-score
    * collapse, but the rank walk windows PARTITION BY the keys, so
    * unlike the global metric no single-partition step exists at all —
    * the whole plan is two keyed aggregates and a keyed window. Null
    * keys group together (they are a slice worth auditing). */
  def aucRocByKey(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column (else use aucRoc)")
    require(!keys.exists(Seq("n_pos", "n_neg", "auc").contains(_)),
      "key columns may not use the reserved output names n_pos/n_neg/auc")
    val kcols = keys.map(qcol)
    val perScore = df
      .where(qcol(scoreCol).isNotNull && qcol(labelCol).isNotNull)
      .groupBy(kcols :+ qcol(scoreCol).as("__s"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(qcol(labelCol).cast("int") === 1, 1L).otherwise(0L))
          .as("__np"))
    val w = Window.partitionBy(kcols: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("__cum", sum(col("__n")).over(w) - col("__n"))
      .withColumn("__rs",
        col("__np") * (col("__cum").cast("double")
          + (col("__n").cast("double") + 1.0) / 2.0))
      .groupBy(kcols: _*)
      .agg(sum(col("__np")).as("__P"),
        sum(col("__n") - col("__np")).as("__N"),
        sum(col("__rs")).as("__R"))
      .select(kcols ++ Seq(
        col("__P").as("n_pos"), col("__N").as("n_neg"),
        round(try_divide(col("__R") - col("__P").cast("double")
            * (col("__P").cast("double") + 1.0) / 2.0,
          col("__P").cast("double") * col("__N").cast("double")), 6)
          .as("auc")): _*)
  }

  /** Precision-recall curve at every distinct score threshold (predict
    * positive when `score >= threshold`), thresholds descending: one
    * row per distinct score — `(threshold, tp, fp, precision, recall)`
    * with exact cumulative counts and 6-rounded ratios. The same
    * per-distinct-score collapse as [[aucRoc]]: the curve's length is
    * the score alphabet, never the corpus. This is the
    * threshold-selection artifact for a quality filter — pick the
    * operating point, then pin it with [[confusionStats]]. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .where(qcol(scoreCol).isNotNull && qcol(labelCol).isNotNull)
      .groupBy(qcol(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"),
        sum(when(qcol(labelCol).cast("int") === 1, 1L).otherwise(0L))
          .as("__np"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totP = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // __guard is always null on the pass path; wrapping tp (live in
    // this output AND in averagePrecision's fold) pins the check
    guardScoreAlphabet(perScore, "prCurve")
      .withColumn("tp",
        when(col("__guard").isNull, sum(col("__np")).over(w)))
      .withColumn("fp", sum(col("__n") - col("__np")).over(w))
      .withColumn("__P", sum(col("__np")).over(totP))
      .select(col("threshold"), col("tp"), col("fp"),
        round(try_divide(col("tp").cast("double"), col("tp") + col("fp")),
          6).as("precision"),
        round(try_divide(col("tp").cast("double"), col("__P")), 6)
          .as("recall"))
  }

  /** Average precision (area under the PR curve by the step rule, the
    * sklearn definition): one row `(n_pos, n_neg, ap)` with
    * `ap = Σ_thresholds (R_t − R_{t−1}) · P_t` walking thresholds
    * descending, rounded to 6. Degenerate inputs (no positives) read
    * null. Same bounded distinct-score walk as [[prCurve]]. */
  def averagePrecision(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val pr = prCurve(df, scoreCol, labelCol)
    val w = Window.orderBy(col("threshold").desc)
    pr.withColumn("__prevTp", coalesce(lag(col("tp"), 1).over(w), lit(0L)))
      .withColumn("__term",
        (col("tp") - col("__prevTp")).cast("double")
          * try_divide(col("tp").cast("double"), col("tp") + col("fp")))
      .agg(sum(col("tp") - col("__prevTp")).as("__P"),
        max(col("fp")).as("__maxFp"),
        sum(col("__term")).as("__apSum"))
      .select(coalesce(col("__P"), lit(0L)).as("n_pos"),
        coalesce(col("__maxFp"), lit(0L)).as("n_neg"),
        round(try_divide(col("__apSum"), col("__P").cast("double")), 6)
          .as("ap"))
  }

  /** Retrieval-quality metrics for a ranked result set against a
    * relevance truth table — the grader for [[TextAnalysis.bm25TopK]]
    * and the ANN top-k family. `results` carries one row per
    * (query, doc) with a 1-based `rankCol`; `truth` one row per
    * relevant (query, doc). One row per query in `results`:
    * `n_relevant | n_hits | recall_at_k | reciprocal_rank | ndcg`,
    * where hits are relevant docs at rank ≤ k, RR = 1/first-hit-rank
    * (0 when nothing relevant surfaced), DCG = Σ 1/log2(rank+1) over
    * hits, IDCG = the best possible arrangement of min(n_relevant, k)
    * hits, and all ratios round to 6. Queries in `truth` only (nothing
    * retrieved) are included with zero metrics; queries with no truth
    * rows read n_relevant = 0 and null ratios (nothing to grade
    * against).
    *
    * Scale shape: one (query, doc)-keyed equi-join of results against
    * truth (both sides pruned to ids+rank), one query-grain aggregate;
    * the IDCG fold is a per-row HOF over min(n_relevant, k) ≤ k terms.
    * Nothing touches corpus text. */
  def rankingMetrics(
      results: DataFrame,
      truth: DataFrame,
      queryIdCol: String,
      docIdCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val res = results.select(qcol(queryIdCol).as("__q"),
      qcol(docIdCol).as("__d"), qcol(rankCol).cast("long").as("__r"))
      .where(col("__r") <= k)
    val rel = truth.select(qcol(queryIdCol).as("__q"),
      qcol(docIdCol).as("__d")).distinct()
    val nRel = rel.groupBy(col("__q"))
      .agg(count(lit(1)).as("n_relevant"))
    val hits = res.join(rel, Seq("__q", "__d"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("__r")).as("__firstHit"),
        sum(lit(1.0) / log2(col("__r").cast("double") + 1.0)).as("__dcg"))
    val queriesSeen = res.select("__q").union(rel.select("__q")).distinct()
    val idcgTerms = (n: Column) => aggregate(
      sequence(lit(1L), least(n, lit(k.toLong))),
      lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0))
    queriesSeen
      .join(nRel, Seq("__q"), "left")
      .join(hits, Seq("__q"), "left")
      .select(col("__q").as(queryIdCol),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(try_divide(coalesce(col("n_hits"), lit(0L)).cast("double"),
          col("n_relevant")), 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__firstHit").cast("double"),
          when(col("n_relevant").isNotNull && col("n_relevant") > 0, 0.0)),
          6).as("reciprocal_rank"),
        round(try_divide(coalesce(col("__dcg"), lit(0.0)),
          when(col("n_relevant") > 0, idcgTerms(col("n_relevant")))),
          6).as("ndcg"))
  }

  /** Confusion-matrix stats at `threshold` (predict positive when
    * `score >= threshold`): one row of exact counts `(tp, fp, tn, fn)`
    * plus `accuracy, precision, recall, f1` rounded to 6 — one
    * conditional-count aggregate, no shuffle of anything but partial
    * counters. Division-by-zero degenerate cases (no predicted
    * positives, no actual positives) surface null, not 0. */
  def confusionStats(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame = {
    val pos = qcol(labelCol).cast("int") === 1
    val pred = qcol(scoreCol) >= lit(threshold)
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    df.where(qcol(scoreCol).isNotNull && qcol(labelCol).isNotNull)
      .agg(cnt(pred && pos).as("tp"), cnt(pred && !pos).as("fp"),
        cnt(!pred && !pos).as("tn"), cnt(!pred && pos).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round(try_divide((col("tp") + col("tn")).cast("double"),
          col("tp") + col("fp") + col("tn") + col("fn")), 6)
          .as("accuracy"),
        round(try_divide(col("tp").cast("double"),
          col("tp") + col("fp")), 6).as("precision"),
        round(try_divide(col("tp").cast("double"),
          col("tp") + col("fn")), 6).as("recall"),
        round(try_divide(lit(2.0) * col("tp").cast("double"),
          lit(2.0) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
  }

  /** Reliability table for a probability-scored model (`scoreCol` in
    * [0, 1]): `nBins` equal-width bins over the score, one row per
    * non-empty bin — `(bin, n, confidence, accuracy)` where confidence
    * is the bin's mean score and accuracy its positive rate, both
    * rounded to 6. `score = 1.0` folds into the top bin. One
    * aggregate; bins are the plot a calibration audit reads. */
  def calibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val bin = least(floor(qcol(scoreCol) * nBins), lit(nBins - 1))
      .cast("int")
    df.where(qcol(scoreCol).isNotNull && qcol(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(qcol(scoreCol)), 6).as("confidence"),
        round(avg(when(qcol(labelCol).cast("int") === 1, 1.0)
          .otherwise(0.0)), 6).as("accuracy"))
  }

  /** Expected calibration error over [[calibration]]'s bins: one row
    * `(n, ece)` with `ece = Σ_bins (n_b/N)·|accuracy_b − confidence_b|`
    * over the ROUNDED per-bin values (so the number is exactly
    * reproducible from the published reliability table), rounded to 6.
    * The fold is over at most `nBins` rows — driver-free but trivially
    * bounded. */
  def expectedCalibrationError(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame =
    calibration(df, scoreCol, labelCol, nBins)
      .agg(sum(col("n")).as("__N"),
        sum(col("n") * abs(col("accuracy") - col("confidence"))).as("__E"))
      .select(coalesce(col("__N"), lit(0L)).as("n"),
        round(try_divide(col("__E"), col("__N").cast("double")), 6)
          .as("ece"))

  /** Cohen's kappa between two categorical label columns (two
    * annotators, or model vs gold): one row `(n, po, pe, kappa)` —
    * observed agreement, chance agreement from the marginals, and
    * `(po − pe)/(1 − pe)`, all rounded to 6. Rows where either side is
    * null are excluded. Perfect chance agreement (pe = 1, both sides
    * constant and equal) yields a null kappa — the statistic is
    * undefined there, and po alone tells the story.
    *
    * Scale shape: one conditional-count aggregate for n/agreement plus
    * one (a, b) contingency aggregate whose size is the label-alphabet
    * product — bounded by vocabulary, not corpus; pe folds over that
    * bounded table. */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val both = df.where(qcol(colA).isNotNull && qcol(colB).isNotNull)
    val cells = both.groupBy(qcol(colA).as("__a"), qcol(colB).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val aM = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
    val bM = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__nb"))
    val n = cells.agg(sum(col("__n")).as("__t"))
    val po = cells.where(col("__a") === col("__b"))
      .agg(sum(col("__n")).as("__agree"))
    val pe = aM.join(bM, col("__a") === col("__b"))
      .crossJoin(broadcast(n))
      .agg(sum(try_divide(
        col("__na").cast("double") * col("__nb").cast("double"),
        col("__t").cast("double") * col("__t").cast("double")))
        .as("__pe"))
    n.crossJoin(broadcast(po)).crossJoin(broadcast(pe))
      .select(col("__t").as("n"),
        round(try_divide(coalesce(col("__agree"), lit(0L)).cast("double"),
          col("__t")), 6).as("po"),
        round(coalesce(col("__pe"), lit(0.0)), 6).as("pe"))
      .select(col("n"), col("po"), col("pe"),
        round(try_divide(col("po") - col("pe"), lit(1.0) - col("pe")), 6)
          .as("kappa"))
  }

  /** All `b` replicate means in ONE aggregate pass with ZERO row
    * amplification: [[graft.functions.PoissonBootstrapAggregator]]
    * carries the 2b interleaved `(Σw·x, Σw)` sums as one
    * `Array[Double]` buffer updated imperatively per row. Two slower
    * formulations were measured out at ×30 (18M rows × 64 replicates):
    * explode(1..b) pays ~295 s of generator-row allocation, and 2b
    * relational aggregate columns blow the whole-stage-codegen method
    * budget into interpreted fallback (~156 s); the buffer runs the
    * identical arithmetic in seconds. The result row(s) are key-grain;
    * the `(replicate, mean)` transpose explodes a b-element array AFTER
    * aggregation — bounded by the report, not the data. Returns
    * `(keys…, __b, __m)`. */
  private def replicateMeans(
      base: DataFrame,
      keyNames: Seq[String],
      b: Int,
      seed: Long): DataFrame = {
    val sums = graft.functions.PoissonBootstrap
      .replicateSums(seed, b)(col("__id"), col("__x")).as("__sums")
    val agged =
      if (keyNames.isEmpty) base.agg(sums)
      else base.groupBy(keyNames.map(col): _*).agg(sums)
    val arr = array((1 to b).map(bb =>
      struct(lit(bb).as("b"),
        element_at(col("__sums"), 2 * bb - 1).as("swx"),
        element_at(col("__sums"), 2 * bb).as("sw"))): _*)
    agged
      .select((keyNames.map(col) :+ explode(arr).as("__e")): _*)
      .select((keyNames.map(col) :+ col("__e.b").as("__b")
        :+ try_divide(col("__e.swx"), col("__e.sw")).as("__m")): _*)
  }

  /** Fleiss' kappa — [[cohenKappa]] generalized to ANY fixed number of
    * raters (the label-quality read on crowdsourced annotation batches
    * where each item was judged by n workers). Input: one row per
    * RATING `(itemCol, categoryCol)`; every item must carry exactly the
    * same number of ratings (guarded loudly — Fleiss is undefined
    * otherwise; cut or pad upstream, explicitly). Output one row:
    * `n_items | n_raters | po | pe | kappa` (rounded 6; a chance-only
    * agreement `pe = 1` reads null kappa). All integer counts until the
    * final divisions: `P_i = (Σ_j n_ij² − n)/(n(n−1))`, `p_j = Σ_i
    * n_ij/(N·n)`, `κ = (P̄ − P̄_e)/(1 − P̄_e)`.
    *
    * Scale shape: one (item, category) count aggregate, one item-grain
    * aggregate, one category-grain aggregate — nothing wider than the
    * contingency structure ever shuffles. */
  def fleissKappa(
      df: DataFrame,
      itemCol: String,
      categoryCol: String): DataFrame = {
    val cells = df
      .where(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(categoryCol).as("__c"))
      .agg(count(lit(1)).as("__nij"))
    val perItem = cells.groupBy("__i")
      .agg(sum("__nij").as("__n"), sum(col("__nij") * col("__nij")).as("__sq"))
    val shape = perItem.agg(count(lit(1)).as("__items"),
      min("__n").as("__nmin"), max("__n").as("__nmax"),
      sum("__sq").as("__sqsum"))
    val catTot = cells.groupBy("__c").agg(sum("__nij").as("__nj"))
      .agg(sum(col("__nj") * col("__nj")).as("__pj2num"))
    // pe = Σ_j (Σ_i n_ij / (N·n))² = Σ_j n_j² / (N·n)²
    shape.crossJoin(broadcast(catTot))
      .select(col("__items"), col("__nmin"), col("__nmax"),
        col("__sqsum"), col("__pj2num"))
      .select(
        when(col("__items") === 0, raise_error(lit(
          "fleissKappa: no ratings"))).otherwise(col("__items"))
          .as("n_items"),
        when(col("__nmin") =!= col("__nmax") || col("__nmin") < 2,
          raise_error(lit("fleissKappa: every item needs the same " +
            "number of ratings (>= 2) - cut or pad upstream")))
          .otherwise(col("__nmin")).as("n_raters"),
        col("__sqsum"), col("__pj2num"))
      .select(col("n_items"), col("n_raters"),
        round(((col("__sqsum") - col("n_items") * col("n_raters"))
            .cast("double")) /
          (col("n_items") * col("n_raters") * (col("n_raters") - 1))
            .cast("double"), 6).as("po"),
        round(col("__pj2num").cast("double") /
          ((col("n_items") * col("n_raters")) *
            (col("n_items") * col("n_raters"))).cast("double"), 6)
          .as("pe"))
      .select(col("n_items"), col("n_raters"), col("po"), col("pe"),
        round(try_divide(col("po") - col("pe"), lit(1.0) - col("pe")), 6)
          .as("kappa"))
  }

  /** Poisson-bootstrap confidence interval for the mean — THE bootstrap
    * that survives 100 TB (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012): instead of resampling n rows
    * B times (unshardable), each (row, replicate) draws an independent
    * Poisson(1) weight, so all `b` replicate sums accumulate in ONE
    * pass. Weights are DETERMINISTIC — replicate `b` reads the 8-hex
    * slice `(b−1)%4` of `md5(seed # id # (b−1)/4)` through the Poisson
    * inverse CDF (see [[replicateWeights]]) — so reruns,
    * repartitionings, and the DuckDB oracle land on identical draws.
    *
    * Output, one row: `n | b | estimate | se | ci_lo | ci_hi` — the
    * plain mean, the bootstrap standard error (sample stddev of the B
    * replicate means), and the percentile-method interval at
    * `1 − alpha` (exact interpolated percentiles over the B means).
    *
    * Scale shape: ONE aggregate scan with zero row amplification
    * ([[replicateMeans]] — 2·b aggregate columns in the same
    * whole-stage-codegen row loop), so the exchange carries
    * `2b × partitions` partial sums, never `n × b` rows; the B
    * replicate means then reduce over one bounded frame (B doubles).
    * Null values are ignored (a null has no mean). Rows whose id is
    * not unique get correlated weights — pass a genuinely unique
    * id. */
  def bootstrapMeanCI(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      b: Int = 100,
      seed: Long = 42L,
      alpha: Double = 0.05): DataFrame = {
    require(b >= 2, "need at least 2 replicates")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val base = df
      .select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("double").as("__x"))
      .where(col("__x").isNotNull)
    // a replicate whose weights all drew 0 (possible only at tiny n)
    // contributes no mean — try_divide nulls it and percentile skips it
    val repMeans = replicateMeans(base, Seq.empty, b, seed)
    val stats = base.agg(count(lit(1)).as("n"),
      avg(col("__x")).as("__est"))
    stats.crossJoin(broadcast(repMeans.agg(
        count(col("__m")).as("__bn"),
        stddev_samp(col("__m")).as("__se"),
        percentile(col("__m"), lit(alpha / 2)).as("__lo"),
        percentile(col("__m"), lit(1.0 - alpha / 2)).as("__hi"))))
      .select(col("n"), col("__bn").as("b"),
        round(col("__est"), 6).as("estimate"),
        round(col("__se"), 6).as("se"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }

  /** Per-slice [[bootstrapMeanCI]]: one CI row per key — the
    * uncertainty-aware form of a sliced metric report (a 2-point gap
    * between slices means nothing when each slice's CI is ±5). Same
    * deterministic Poisson weights, same zero-amplification one-pass
    * shape with the key as the grouping: the exchange is
    * `keys × 2b × partitions` partial sums, the percentile reduction is
    * `keys × b` replicate means — both bounded by the report size,
    * never the data. Output:
    * `keyCols… | n | b | estimate | se | ci_lo | ci_hi`. */
  def bootstrapMeanCIByKey(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      keyCols: Seq[String],
      b: Int = 100,
      seed: Long = 42L,
      alpha: Double = 0.05): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty (use bootstrapMeanCI for the global CI)")
    require(b >= 2, "need at least 2 replicates")
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    val keys = keyCols.map(col)
    val base = df
      .select((keys :+ col(idCol).cast("string").as("__id")
        :+ col(valueCol).cast("double").as("__x")): _*)
      .where(col("__x").isNotNull)
    val repMeans = replicateMeans(base, keyCols, b, seed)
    val ciByKey = repMeans.groupBy(keys: _*)
      .agg(count(col("__m")).as("b"),
        stddev_samp(col("__m")).as("__se"),
        percentile(col("__m"), lit(alpha / 2)).as("__lo"),
        percentile(col("__m"), lit(1.0 - alpha / 2)).as("__hi"))
    val statsByKey = base.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), avg(col("__x")).as("__est"))
    statsByKey.join(ciByKey, keyCols)
      .select((keys :+ col("n") :+ col("b")
        :+ round(col("__est"), 6).as("estimate")
        :+ round(col("__se"), 6).as("se")
        :+ round(col("__lo"), 6).as("ci_lo")
        :+ round(col("__hi"), 6).as("ci_hi")): _*)
  }
}
