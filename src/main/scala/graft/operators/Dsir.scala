package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023): pick
  * the raw-corpus documents whose hashed n-gram distribution looks most
  * like a trusted TARGET corpus. The published recipe — fit bag-of-
  * hashed-grams generative models on target and raw, score every raw
  * document by its log importance ratio `Σ_tokens (ln p_target(b(tok)) −
  * ln p_raw(b(tok)))`, then Gumbel-top-k resample on the log weights —
  * re-expressed in Spark's execution model:
  *
  *  - '''Featurization''' is a deterministic md5 bucket per token
  *    (`md5(tok)[0,8) as hex → long mod buckets` — the house
  *    [[Sampling.hashSample]] arithmetic, so any engine replays it).
  *  - '''Training''' is one explode + count aggregate per corpus with a
  *    `≤ buckets`-row collect (bounded by construction; `buckets`
  *    defaults to 4096, the paper uses 10k — both driver-trivial).
  *  - '''Scoring''' is a single shuffle-free codegen'd higher-order-
  *    function walk: the `buckets`-sized log-ratio table rides the plan
  *    as one array literal, each token adds `element_at(table, bucket)`.
  *    No UDF, no join, no shuffle — a 100 TB raw corpus pays one scan.
  *  - '''Resampling''' is the Gumbel-max trick on hash-derived uniforms
  *    (`key = score − ln(−ln u)`, u from md5 of the id — deterministic,
  *    rerun- and repartition-stable) + a distributed TakeOrdered top-k;
  *    no window, no global sort materialization.
  *
  * Ref parity note: the reference has no data-selection operator; extends
  * the analytics surface per the training-data-ops mandate (SURVEY §2
  * addendum).
  */
object Dsir {

  /** A trained DSIR importance model: `logRatios(b) = ln p_target(b) −
    * ln p_raw(b)` over the `buckets` hashed-token buckets, Laplace-`alpha`
    * smoothed. Driver-bounded (`buckets` doubles). Persists via
    * [[graft.store.Artifacts]] (`dsir_model` manifests). */
  final case class DsirModel(
      buckets: Int, alpha: Double, logRatios: Array[Double]) {
    require(buckets > 0 && logRatios.length == buckets,
      s"logRatios length ${logRatios.length} != buckets $buckets")
    require(alpha > 0, "alpha must be positive")
  }

  /** The md5 token→bucket map shared by training, scoring, and the SQL
    * oracle: first 8 hex chars of md5 as a long, mod `buckets`. */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Lowercased space-split tokens with empties dropped (double spaces
    * are not grams). */
  private def nonEmptyTokens(t: Column): Column =
    filter(TextAnalysis.tokens(t), tok => tok =!= "")

  /** Bucket counts for one corpus: one explode + aggregate, `≤ buckets`
    * rows collected. */
  private def bucketCounts(
      df: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    val rows = df
      .select(explode(nonEmptyTokens(col(textCol))).as("__tok"))
      .select(bucketOf(col("__tok"), buckets).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect()
    val arr = new Array[Long](buckets)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Fit the importance model: hashed-unigram bag-of-words distributions
    * on `target` and `raw` (Laplace-`alpha` over the `buckets` outcomes),
    * stored as the per-bucket log ratio. Two count shuffles + two bounded
    * collects, nothing else. */
  def train(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      buckets: Int = 4096,
      alpha: Double = 1.0): DsirModel = {
    require(buckets > 0, "buckets must be positive")
    require(alpha > 0, "alpha must be positive")
    val tc = bucketCounts(target, textCol, buckets)
    val rc = bucketCounts(raw, textCol, buckets)
    val tn = tc.sum.toDouble
    val rn = rc.sum.toDouble
    val ratios = Array.tabulate(buckets) { b =>
      math.log((tc(b) + alpha) / (tn + alpha * buckets)) -
        math.log((rc(b) + alpha) / (rn + alpha * buckets))
    }
    DsirModel(buckets, alpha, ratios)
  }

  /** The per-document log importance ratio as a pure column: one
    * higher-order-function walk over the tokens, the log-ratio table as
    * one array literal (constant-folded into the generated code, not a
    * per-row broadcast lookup). A document with no tokens scores 0 —
    * the model is indifferent to it. */
  def scoreCol(t: Column, model: DsirModel): Column =
    aggregate(
      nonEmptyTokens(t),
      lit(0.0),
      (acc, tok) => acc + element_at(
        typedlit(model.logRatios.toSeq),
        (bucketOf(tok, model.buckets) + lit(1L)).cast("int")))

  /** [[scoreCol]] attached as `out` (default `dsir_score`). */
  def score(
      df: DataFrame,
      textCol: String,
      model: DsirModel,
      out: String = "dsir_score"): DataFrame =
    df.withColumn(out, scoreCol(col(textCol), model))

  /** Gumbel-top-`k` importance resampling on the log weights (the DSIR
    * selection step, equivalent to weighted sampling without replacement
    * on `exp(score)` but computed entirely in log space — no overflow at
    * any score magnitude): `key = score − ln(−ln u)` with `u ∈ (0, 1)`
    * hash-derived from `idCol`, top `k` by `(key, id)`. Deterministic,
    * rerun/repartition-stable, and a distributed TakeOrdered — no
    * window. Output: the selected input rows + `dsir_score`. */
  def resample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel,
      k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = score(df, textCol, model)
    val u = (conv(substring(md5(concat_ws("#", lit(seed),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit(4294967297.0)
    scored
      .withColumn("__gk", col("dsir_score") - log(-log(u)))
      .orderBy(col("__gk").desc, col(idCol))
      .limit(k)
      .drop("__gk")
  }
}
